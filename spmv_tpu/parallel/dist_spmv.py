"""Multi-chip SpMV over a device mesh (shard_map + ICI collectives).

The layer the single-GPU reference lacks (SURVEY §2/§7). v2 design
(VERDICT r1 item 4):

- **Halo-compacted exchange**: the plan (partition.build_halo_plan)
  knows exactly which x entries each chip reads from each owner;
  the runtime exchange is ONE `all_to_all` of value payloads sized by
  the halo (not an all-gather of every column). Remote column indices
  are remapped at plan time into halo-table coordinates — zero index
  traffic.
- **Overlap**: each shard's nonzeros are split into a SELF block
  (locally-owned columns; no dependency on the exchange) and a HALO
  block (depends on the received table). XLA's latency-hiding
  scheduler runs the `all_to_all` concurrently with the self matvec
  because the data dependencies permit it; y = reduce(y_self, y_halo).
- **Pallas local kernel**: each block runs the ELL group-reduce kernel
  (kernels/ell.py machinery) inside shard_map — per-chip compute is a
  real TPU kernel, not an XLA scatter fallback.

`mode="allgather"` keeps the v1 full-gather path (useful as a
baseline and for meshes where the halo is nearly everything).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from spmv_tpu import config
from spmv_tpu.formats import CSR, COO, coo_to_csr
from spmv_tpu.kernels.ell import build_ell_plan, SUBLANES
from spmv_tpu.kernels.pallas_utils import LANES
from spmv_tpu.ops.semiring import (
    Semiring,
    PLUS_TIMES,
    segment_reduce_sorted,
)
from spmv_tpu.parallel.partition import HaloPlan, build_halo_plan


def _stack_ell(plans, R):
    """Stack per-shard EllPlans, padded to uniform (Tv, V)."""
    Tv = max(p.n_tiles for p in plans)
    V = max(p.n_vrows for p in plans)
    n = len(plans)
    W = plans[0].width
    aj = np.zeros((n, Tv, SUBLANES, LANES), np.int32)
    ax = np.zeros((n, Tv, SUBLANES, LANES), np.asarray(plans[0].ax).dtype)
    valid = np.zeros((n, Tv, SUBLANES, LANES), bool)
    vrow = np.full((n, V), R, np.int32)  # pad rows -> segment R (dropped)
    for s, p in enumerate(plans):
        aj[s, :p.n_tiles] = np.asarray(p.aj)
        ax[s, :p.n_tiles] = np.asarray(p.ax)
        valid[s, :p.n_tiles] = np.asarray(p.valid)
        vrow[s, :p.n_vrows] = np.asarray(p.vrow_row)
    return {"aj": aj, "ax": ax, "valid": valid, "vrow": vrow,
            "Tv": Tv, "V": V, "W": W}


def _block_ell_plans(rows, cols, vals, R, W):
    """Per-shard ELL plans for a (rows, cols, vals) padded block whose
    pad entries carry row id R (excluded).

    Only rows that actually have entries are packed: R is the max
    rows/shard, and a block (the halo especially) often touches a
    small subset — packing arange(R) would spend >=1 chunk per empty
    row (53K wasted chunks/shard measured on an 8-shard power-law).
    Missing rows come out of the segment reduce as the identity, which
    is exactly what sr.reduce(y_self, y_halo) needs."""
    n = rows.shape[0]
    plans = []
    for s in range(n):
        m = rows[s] < R
        coo = COO(R, int(cols.max() + 1) if cols.size else 1,
                  rows[s][m].astype(np.int64),
                  cols[s][m].astype(np.int64), vals[s][m])
        nonempty = np.unique(coo.rows)
        if nonempty.size == 0:
            nonempty = np.zeros(1, np.int64)  # degenerate: one empty row
        plans.append(build_ell_plan(
            coo_to_csr(coo, offset_dtype=np.int64), nonempty, W))
    return _stack_ell(plans, R)


def _block_width(rows, R) -> int:
    """ELL lane width for a distributed block, chosen by exactly
    minimizing the stacked tile count (= padded slots = HBM traffic).

    A mean-based pick (select_width) misjudges power-law blocks: the
    hub rows are insensitive to W (ceil(len/W)*W ~ len) while every
    short row pays ceil(len/W)*W - len, so the slot-count argmin lands
    near the TAIL's width, not the mean's. Tiles are what the stacked
    shard_map kernel iterates and streams, so minimize max-over-shards
    tiles; ties prefer wider W (fewer cross-lane segments per row)."""
    candidates = (2, 4, 8, 16, 32, 64, 128)
    slots_per_tile = SUBLANES * LANES
    best_w, best_t = 2, None
    for W in candidates:
        worst = 1
        for s in range(rows.shape[0]):
            r = rows[s][rows[s] < R]
            if r.size == 0:
                continue
            lens = np.bincount(r - r.min())
            lens = lens[lens > 0]
            chunks = int(((lens + W - 1) // W).sum())
            worst = max(worst, (chunks * W + slots_per_tile - 1)
                        // slots_per_tile)
        if best_t is None or worst <= best_t:
            best_w, best_t = W, worst
    return best_w


@dataclasses.dataclass
class DistributedSpMV:
    """A CSR matrix distributed over one mesh axis, ready for matvec."""

    mesh: Mesh
    axis: str
    plan: HaloPlan
    n_rows: int
    n_cols: int
    dev: dict            # sharded device arrays
    unpad_idx: jax.Array  # (n_rows,) into flattened (n*R_out,) owned y
    x_pad: int           # n_shards * B

    @property
    def comm_bytes_per_shard(self) -> int:
        return self.plan.comm_bytes_per_shard

    @property
    def allgather_bytes_per_shard(self) -> int:
        return self.plan.allgather_bytes_per_shard

    def shard_x(self, x) -> jax.Array:
        from spmv_tpu.parallel.bootstrap import put_global

        xp = np.zeros((self.x_pad,), np.asarray(x).dtype)
        xp[: self.n_cols] = np.asarray(x)
        return put_global(xp, NamedSharding(self.mesh, P(self.axis)))

    def matvec(self, x, semiring: Semiring = PLUS_TIMES,
               mode: str = "halo") -> jax.Array:
        """y = A·x, x/y row-sharded over the mesh axis.

        mode='halo' (default): all_to_all of halo values overlapped
        with the self-block matvec. mode='allgather': v1 full gather.
        """
        x = jnp.asarray(x)
        if x.shape[0] == self.n_cols and self.n_cols != self.x_pad:
            x = self.shard_x(x)
        d = self.dev
        return _dist_matvec(
            d["send_idx"], d["recv_idx"], d["self"], d["halo"],
            d["idx_own"], d["own_start"], self.unpad_idx, x,
            mesh=self.mesh, axis=self.axis, R=self.plan.R,
            shapes=self._shapes, sr=semiring, mode=mode,
            interpret=config.use_interpret(),
            export_meta=(tuple(int(r) for r in self.plan.export_rows),
                         bool(self.plan.export_flag.any())),
        )

    @property
    def _shapes(self):
        s, h = self.dev["self"], self.dev["halo"]
        return (int(s["aj"].shape[1]), int(s["vrow"].shape[1]),
                int(self.dev["W_self"]),
                int(h["aj"].shape[1]), int(h["vrow"].shape[1]),
                int(self.dev["W_halo"]))


def _local_ell_matvec(aj, ax, valid, vrow, x, *, W, Tv, V, R,
                      sr: Semiring, identity, interpret):
    """ELL group-reduce matvec for one shard's block (runs inside
    shard_map; the group reduction is the Pallas kernel from
    kernels/ell.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from spmv_tpu.kernels.ell import _group_reduce_kernel

    val_dtype = x.dtype
    xg = jnp.take(x, aj.reshape(-1)).reshape(aj.shape)
    prod = sr.combine(ax.astype(val_dtype), xg)
    prod = jnp.where(valid, prod, identity)

    kernel = _group_reduce_kernel(sr, identity, W, "tree")
    reduced = pl.pallas_call(
        kernel,
        grid=(Tv,),
        in_specs=[pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tv, SUBLANES, LANES), val_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(prod)
    y_vrow = reduced.reshape(Tv * SUBLANES, LANES)[:, ::W].reshape(-1)[:V]
    return segment_reduce_sorted(y_vrow, vrow, R + 1, sr, identity)[:R]


@functools.partial(jax.jit, static_argnames=(
    "mesh", "axis", "R", "shapes", "sr", "mode", "interpret",
    "export_meta"))
def _dist_matvec(send_idx, recv_idx, blk_self, blk_halo, idx_own,
                 own_start, unpad_idx, x,
                 *, mesh, axis, R, shapes, sr, mode, interpret,
                 export_meta):
    Tvs, Vs, Ws, Tvh, Vh, Wh = shapes
    n = mesh.shape[axis]
    identity = float(sr.identity_for(np.dtype(x.dtype)))
    # plan-time constants, identical on every shard (baked in)
    export_rows, any_export = export_meta

    def local(send_idx_l, recv_idx_l, ajs, axs, vds, vrs,
              ajh, axh, vdh, vrh, idx_own_l, own_start_l, x_l):
        xl = x_l
        if mode == "allgather":
            # v1 baseline: gather every column, then read the SAME
            # halo-table coordinates out of the full vector
            # (recv_idx[me][t] = what owner t would have sent me)
            x_full = jax.lax.all_gather(xl, axis, tiled=True)
            ri = recv_idx_l[0]
            B = x_full.shape[0] // n
            base = jnp.arange(n, dtype=ri.dtype)[:, None] * B
            table = jnp.take(x_full, (ri + base).reshape(-1))
        else:
            # value-only halo exchange; the self matvec below has no
            # data dependency on it, so XLA overlaps the two
            send = jnp.take(xl, send_idx_l[0].reshape(-1)).reshape(
                send_idx_l[0].shape)
            recv = jax.lax.all_to_all(
                send, axis, split_axis=0, concat_axis=0, tiled=False)
            table = recv.reshape(-1)
        y_self = _local_ell_matvec(
            ajs[0], axs[0], vds[0], vrs[0], xl,
            W=Ws, Tv=Tvs, V=Vs, R=R, sr=sr, identity=identity,
            interpret=interpret)
        y_halo = _local_ell_matvec(
            ajh[0], axh[0], vdh[0], vrh[0], table,
            W=Wh, Tv=Tvh, V=Vh, R=R, sr=sr, identity=identity,
            interpret=interpret)
        y = sr.reduce(y_self, y_halo)
        # owned output block: slot j = local row idx_own[j] (-1 -> id)
        io = idx_own_l[0]
        y_own = jnp.where(io >= 0, jnp.take(y, jnp.clip(io, 0, R - 1)),
                          identity)
        if any_export:
            # rows split across shards: every shard whose entry range
            # starts mid-row exports its partial for that first row;
            # the row's owner reduces them in (the cross-chip carry
            # fixup — SURVEY §7.6 boundary-partial combine). Tiny:
            # one value per shard, one all_gather. export_rows is a
            # plan-time constant, so the same-row grouping is done in
            # NumPy at trace time and the traced graph is O(1) in the
            # shard count (VERDICT r3 item 7): one static permutation,
            # one segment reduce, one distinct-index scatter.
            parts = jax.lax.all_gather(y[:1], axis, tiled=True)  # (n,)
            er = np.asarray(export_rows)
            order = np.argsort(er, kind="stable")
            er_sorted = er[order]
            uniq, seg_of = np.unique(er_sorted, return_inverse=True)
            ps = jnp.take(parts, jnp.asarray(order))
            ps = jnp.where(jnp.asarray(er_sorted >= 0), ps, identity)
            comb = segment_reduce_sorted(
                ps, jnp.asarray(seg_of.astype(np.int32)), len(uniq),
                sr, identity)
            keep = np.nonzero(uniq >= 0)[0]
            if keep.size:
                comb_v = jnp.take(comb, jnp.asarray(keep))
                pos = jnp.asarray(uniq[keep]) - own_start_l[0, 0]
                # rows owned elsewhere fall out of [0, R_out): gather
                # with a fill and scatter with mode="drop" — clipping
                # instead would collide several masked updates on index
                # R_out-1 and the duplicate-scatter winner is undefined.
                # JAX wraps NEGATIVE indices even under fill/drop, so
                # send those to an out-of-bounds sentinel first.
                pos = jnp.where(pos >= 0, pos, y_own.shape[0])
                old = jnp.take(y_own, pos, mode="fill",
                               fill_value=identity)
                upd = sr.reduce(old, comb_v)
                y_own = y_own.at[pos].set(upd, mode="drop")
        return y_own[None, :]

    y_sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None),
                  P(axis, None, None, None), P(axis, None, None, None),
                  P(axis, None, None, None), P(axis, None),
                  P(axis, None, None, None), P(axis, None, None, None),
                  P(axis, None, None, None), P(axis, None),
                  P(axis, None), P(axis, None),
                  P(axis)),
        out_specs=P(axis, None),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(send_idx, recv_idx, blk_self["aj"], blk_self["ax"],
      blk_self["valid"], blk_self["vrow"], blk_halo["aj"],
      blk_halo["ax"], blk_halo["valid"], blk_halo["vrow"],
      idx_own, own_start, x)
    y_flat = y_sharded.reshape(-1)
    return jnp.take(y_flat, unpad_idx)


def distribute_csr(
    A: CSR,
    mesh: Mesh,
    axis: str = "shards",
    balance: str = "nnz",
) -> DistributedSpMV:
    n = mesh.shape[axis]
    plan = build_halo_plan(A, n, balance=balance)
    R = plan.R

    W_self = _block_width(plan.rows_self, R)
    W_halo = _block_width(plan.rows_halo, R)
    blk_self = _block_ell_plans(plan.rows_self, plan.cols_self,
                                plan.vals_self, R, W_self)
    blk_halo = _block_ell_plans(plan.rows_halo, plan.cols_halo,
                                plan.vals_halo, R, W_halo)

    row_starts = plan.row_starts  # ownership starts
    shard_of = np.searchsorted(row_starts, np.arange(A.n_rows),
                               side="right") - 1
    shard_of = np.clip(shard_of, 0, n - 1)
    unpad_idx = (shard_of * plan.R_out
                 + (np.arange(A.n_rows) - row_starts[shard_of]))

    from spmv_tpu.parallel.bootstrap import put_global

    shd3 = NamedSharding(mesh, P(axis))
    put = lambda a: put_global(np.asarray(a), shd3)
    dev = {
        "send_idx": put(plan.send_idx),
        # recv_idx[s, t] = send_idx[t, s]: what owner t sends shard s
        # (the allgather-baseline table construction needs it locally)
        "recv_idx": put(plan.send_idx.transpose(1, 0, 2).copy()),
        "self": {k: put(blk_self[k]) for k in ("aj", "ax", "valid", "vrow")},
        "halo": {k: put(blk_halo[k]) for k in ("aj", "ax", "valid", "vrow")},
        "idx_own": put(plan.idx_own),
        "own_start": put(plan.row_starts[:n, None].astype(np.int32)),
        "W_self": W_self,
        "W_halo": W_halo,
    }
    return DistributedSpMV(
        mesh=mesh,
        axis=axis,
        plan=plan,
        n_rows=A.n_rows,
        n_cols=A.n_cols,
        dev=dev,
        unpad_idx=jnp.asarray(unpad_idx.astype(np.int32)),
        x_pad=n * plan.B,
    )
