"""ELL-style packed row execution: shared machinery for the
csr-vector and LightSpMV kernel families.

The reference's csr-vector kernels assign T ∈ {2,4,8,16,32} threads to
each row (ref: cusp/cusp.cuh:19-142) — T lanes stride through the
row's nonzeros and reduce. The TPU translation assigns **W lanes per
row chunk**: rows are cut into chunks of W nonzeros ("virtual rows"),
chunks are packed densely into (8, 128) VMEM tiles (128/W chunks per
lane-row), a Pallas kernel reduces within each W-lane group, and an
XLA epilogue combines a row's chunks with a sorted segment reduction.

This layout is also the LightSpMV analog's substrate: LightSpMV's
dynamic atomic-counter row scheduling (ref: LightSpMV.cuh:110-263)
exists to keep warps busy despite skewed row lengths; on TPU there are
no global atomics, so the equivalent is **static binning by row
length** (rows bucketed by nnz, each bin packed at its own W) — same
goal, load balance, achieved at plan time.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu import config
from spmv_tpu.formats import CSR
from spmv_tpu.ops.semiring import Semiring
from spmv_tpu.kernels.pallas_utils import LANES, lane_iota, strided_group_reduce

SUBLANES = 8
SLOT_ROWS = SUBLANES  # sublanes per tile


@dataclasses.dataclass
class EllPlan:
    """Packed chunks for one (row subset, W)."""

    width: int  # W, lanes per chunk (power of two ≤ 128)
    n_vrows: int  # valid chunk count V
    n_tiles: int  # Tv
    aj: jax.Array  # (Tv, 8, 128) int32
    ax: jax.Array  # (Tv, 8, 128) values
    valid: jax.Array  # (Tv, 8, 128) bool
    vrow_row: jax.Array  # (V,) int32 global row of each chunk
    # planned paged gather for the phase-A x read (None = XLA
    # jnp.take, the round-4 cliff; VERDICT r4 item 2)
    pgather: object = None


def build_ell_plan(A: CSR, rows: np.ndarray, width: int) -> EllPlan:
    """Pack the given rows' nonzeros at W=width lanes per chunk.

    rows: sorted array of global row indices to pack (a bin, or all
    rows). Rows are cut into ceil(len/W) chunks (min 1, so empty rows
    still yield an identity-valued chunk and need no special casing in
    the epilogue).
    """
    W = width
    assert W & (W - 1) == 0 and 1 <= W <= LANES
    G = LANES // W  # chunks per lane-row
    slots_per_tile = SUBLANES * G

    Ap = np.asarray(A.Ap, dtype=np.int64)
    Aj = np.asarray(A.Aj)
    Ax = np.asarray(A.Ax)
    rows = np.asarray(rows, dtype=np.int64)

    # Native C++ chunk walk when available (spmv_tpu/native/host.cpp
    # spmv_ell_fill); NumPy fallback below has identical semantics.
    k = valid = vrow_row = None
    try:
        from spmv_tpu import native

        if native.available():
            k, valid, vrow_row = native.ell_chunks(rows, Ap, W, int(Ap[-1]))
    except (NotImplementedError, ValueError):
        k = None
    if k is None:
        lens = Ap[rows + 1] - Ap[rows]
        n_chunks = np.maximum((lens + W - 1) // W, 1)
        V = int(n_chunks.sum())
        # chunk -> (row, chunk_index_within_row)
        vrow_row = np.repeat(rows, n_chunks)
        chunk_in_row = np.arange(V, dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        # element (v, w) -> CSR position
        k = (
            np.repeat(Ap[vrow_row] + chunk_in_row * W, W).reshape(V, W)
            + np.arange(W, dtype=np.int64)[None, :]
        )
        k_end = np.repeat(Ap[vrow_row + 1], W).reshape(V, W)
        valid = k < k_end
        k = np.minimum(k, max(int(Ap[-1]) - 1, 0))
        vrow_row = vrow_row.astype(np.int32)
    V = vrow_row.shape[0]
    Tv = max((V + slots_per_tile - 1) // slots_per_tile, 1)
    V_pad = Tv * slots_per_tile
    if int(Ap[-1]) == 0:  # empty matrix: all slots invalid
        aj = np.zeros((V, W), np.int32)
        ax = np.zeros((V, W), Ax.dtype if Ax.size else np.float32)
    else:
        aj = np.where(valid, Aj[k], 0).astype(np.int32)
        ax = np.where(valid, Ax[k], 0).astype(Ax.dtype)

    def pad_tiles(arr, fill):
        out = np.full((V_pad, W), fill, dtype=arr.dtype)
        out[:V] = arr
        # (V_pad, W) -> (Tv, 8, G, W) -> (Tv, 8, 128); chunk slot order:
        # slot = ((t*8 + s)*G + g), lanes [g*W, (g+1)*W).
        return out.reshape(Tv, SUBLANES, G, W).reshape(Tv, SUBLANES, LANES)

    aj_t = pad_tiles(aj, 0)
    valid_t = pad_tiles(valid, False)
    from spmv_tpu.kernels.pgather import build_paged_gather_plan

    pg = build_paged_gather_plan(
        np.where(valid_t, aj_t.astype(np.int64), -1).reshape(-1),
        A.n_cols, np.dtype(Ax.dtype).itemsize if Ax.size else 4)
    return EllPlan(
        width=W,
        n_vrows=V,
        n_tiles=Tv,
        aj=jnp.asarray(aj_t),
        ax=jnp.asarray(pad_tiles(ax, 0)),
        valid=jnp.asarray(valid_t),
        vrow_row=jnp.asarray(vrow_row.astype(np.int32)),
        pgather=pg,
    )


def _group_reduce_kernel(sr: Semiring, identity: float, W: int, strategy: str):
    """Per-tile kernel: reduce each W-lane group to its leader lane.

    strategy:
      'linear'    — W-1 sequential roll-accumulate steps; the
                    shared-memory tree loop analog (ref: cusp.cuh:82-136).
      'tree'      — log2(W) roll steps; the warp-shuffle reduction
                    analog (ref: cusp/utils.cuh:38-47).
      'broadcast' — tree reduce, then roll-broadcast the result to all
                    lanes of the group; the shuffle offset-broadcast
                    variant analog (ref: cusp_warp_read_reduce.cuh:27-34).
    """

    def kernel(prod_ref, out_ref):
        v = prod_ref[0]
        if strategy == "linear":
            lanes = lane_iota(v.shape)
            acc = v
            for d in range(1, W):
                sv = pltpu.roll(v, (LANES - d) % LANES, 1)
                ok = (lanes % W) == 0
                acc = jnp.where(ok, sr.reduce(acc, sv), acc)
            v = acc
        else:
            v = strided_group_reduce(v, W, sr.reduce)
            if strategy == "broadcast" and W > 1:
                # Roll-broadcast leader to the whole group.
                lanes = lane_iota(v.shape)
                d = 1
                while d < W:
                    sv = pltpu.roll(v, d, 1)
                    take = (lanes % W) >= d
                    v = jnp.where(take, sv, v)
                    d *= 2
        out_ref[0] = v

    return kernel


# `sr` is static: any user-defined Semiring object traces straight in
# (the functor_t analog, ref: merge_genl/agent_spmv_orig.cuh:98-124).
@functools.partial(
    jax.jit,
    static_argnames=("sr", "W", "Tv", "V", "n_rows", "strategy", "interpret",
                     "val_dtype", "pregathered"),
)
def _ell_spmv_device(
    aj, ax, valid, vrow_row, x,
    *, sr: Semiring, W: int, Tv: int, V: int, n_rows: int,
    strategy: str, interpret: bool, val_dtype, pregathered: bool = False,
):
    identity = float(sr.identity_for(np.dtype(val_dtype)))
    G = LANES // W

    # Phase A: gather x, combine, mask invalid slots to identity. With
    # a paged-gather plan the read already happened in the Pallas
    # planned kernel (kernels/pgather.py); the XLA element gather is
    # the fallback for huge x tables (VERDICT r4 item 2).
    if pregathered:
        xg = x.reshape(aj.shape)
    else:
        xg = jnp.take(x, aj.reshape(-1)).reshape(aj.shape)
    prod = sr.combine(ax.astype(val_dtype), xg.astype(val_dtype))
    prod = jnp.where(valid, prod, identity)

    # Phase B (Pallas): group reduction within each chunk.
    kernel = _group_reduce_kernel(sr, identity, W, strategy)
    reduced = pl.pallas_call(
        kernel,
        grid=(Tv,),
        in_specs=[pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Tv, SUBLANES, LANES), jnp.dtype(val_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(prod)

    # Phase C (XLA): leaders -> chunk values -> per-row combine (sorted
    # segment reduce; generic semirings via associative_scan — see
    # ops/semiring.segment_reduce_sorted).
    from spmv_tpu.ops.semiring import segment_reduce_sorted

    y_vrow = reduced.reshape(Tv * SUBLANES, LANES)[:, ::W].reshape(-1)[:V]
    return segment_reduce_sorted(y_vrow, vrow_row, n_rows, sr, identity)


def ell_spmv(A: CSR, x, semiring: Semiring, plan: EllPlan, strategy: str):
    from spmv_tpu.ops.registry import resolve_val_dtype

    x = jnp.asarray(x)
    val_dtype = resolve_val_dtype(A, x)
    xin = x
    pregathered = plan.pgather is not None
    if pregathered:
        from spmv_tpu.kernels.pgather import paged_gather

        xin = paged_gather(x.astype(val_dtype), plan.pgather)
    return _ell_spmv_device(
        plan.aj, plan.ax, plan.valid, plan.vrow_row, xin,
        sr=semiring, W=plan.width, Tv=plan.n_tiles,
        V=plan.n_vrows, n_rows=A.n_rows, strategy=strategy,
        interpret=config.use_interpret(), val_dtype=np.dtype(val_dtype),
        pregathered=pregathered,
    )


def select_width(mean_nnz_per_row: float, table=((2, 2), (4, 4), (8, 8), (16, 16))) -> int:
    """Threads-per-row heuristic (ref: cusp.cuh:187-222): mean nnz/row
    ≤2→2, ≤4→4, ≤8→8, ≤16→16, else 32 — extended for 128-lane TPU
    vectors with wider tiers for very dense rows."""
    for bound, width in table:
        if mean_nnz_per_row <= bound:
            return width
    if mean_nnz_per_row <= 64:
        return 32
    if mean_nnz_per_row <= 128:
        return 64
    return 128
