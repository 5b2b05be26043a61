"""Distributed SpMV with the FAST stream pipeline per chip.

Round 3 ran the XLA element-gather ELL path inside `shard_map` — the
exact pattern the single-chip zoo abandoned as TPU-slow (VERDICT r3
item 4). This module puts the plan-routed stream pipeline
(kernels/stream.py: gather+reduce pass, planned shuffle, exact-rank
scan) inside the shard_map, so per-chip compute runs at the
single-chip kind's speed while the halo exchange stays the compact
`all_to_all` of parallel/partition.py.

SPMD uniformity: shard_map compiles ONE program, so every plan-shaped
static must match across shards. `build_uniform_plans` forces a common
geometry — common gather-tile count, common partial-stream quota (Qp),
the LARGEST shard's shuffle levels replayed on every shard
(plan_shuffle_multi with explicit levels; smaller shards trivially
satisfy the quota checks), and a common final-tile count — then stacks
every per-shard plan array along a leading shard axis. The per-shard
ragged-concat y assembly is replaced by a uniform row-gather (its
merge sources are data, not trace structure).

Scope: every semiring — plus_times/f32 rides the MXU prefix-difference
kernels; other rings/widths run the segmented roll-scan variants of
the same plan (the run-start stream ships with every uniform plan).
Planner overflows fall back to the ELL path in parallel/dist_spmv.py.

Reference analog: none — the reference is single-GPU (SURVEY §2); this
is the NEW multi-chip layer, with the GPU texture-cache x-gather
replaced per chip by the plan-time column sort, and the cross-chip
carry fixup (boundary-partial combine) shared with dist_spmv.
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
from spmv_tpu.kernels.pallas_utils import LANES
from spmv_tpu.kernels import stream as st
from spmv_tpu.kernels.shuffle import (
    TILE,
    plan_shuffle_auto,
    plan_shuffle_multi,
    _run_split,
)
from spmv_tpu.ops.registry import PlanCapacityError
from spmv_tpu.ops.routing import route_tiles
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES
from spmv_tpu.parallel.partition import HaloPlan, build_halo_plan


def _local_csr(plan: HaloPlan, s: int, val_dtype) -> CSR:
    """Shard s's local matrix over the UNIFORM local column space
    [0, B) owned x block ++ [B, B + n*M) halo table."""
    R = plan.R
    rows = np.concatenate([plan.rows_self[s], plan.rows_halo[s]])
    cols = np.concatenate(
        [plan.cols_self[s],
         plan.cols_halo[s] + plan.B]).astype(np.int64)
    vals = np.concatenate([plan.vals_self[s], plan.vals_halo[s]])
    live = rows < R
    C = plan.B + plan.n_shards * plan.M
    coo = COO(R, C, rows[live].astype(np.int64), cols[live],
              vals[live].astype(val_dtype))
    return coo_to_csr(coo, offset_dtype=np.int64)


@dataclasses.dataclass
class UniformStreamPlans:
    """Stacked per-shard stream plans with one common geometry."""

    n: int
    pad_tiles: int
    x_rows_pad: int          # rows of each shard's padded x2d
    n_aug: int               # common hot-page rows (0 on most shards)
    F_pad: int
    Qp: int
    out_rows: int
    split_meta: list         # per pass: dict(n_steps, sbt, K, Q, out_rows)
    dev: dict                # stacked device arrays (leading shard axis)
    n_y_rows: int            # R (local y rows)


def _build_one(A: CSR, policy, F_common=None, levels=None, Qp=None,
               s_pad=None, pad_tiles=None):
    """One shard's plan pieces under (optionally) forced geometry.

    Mirrors build_stream_plan's flow but returns host arrays and the
    chosen geometry so the caller can force it on every shard. A None
    force means 'discover' (used for the reference shard)."""
    Ap = np.asarray(A.Ap, dtype=np.int64)
    Aj = np.asarray(A.Aj, dtype=np.int64)
    Ax = np.asarray(A.Ax)
    nnz = int(Ap[-1])
    row_ids = np.repeat(np.arange(A.n_rows, dtype=np.int64),
                        Ap[1:] - Ap[:-1])
    x_blocks_pad = -(-A.n_cols // (LANES * LANES))

    res = st._plan_gather_reduce(Aj, row_ids, policy, x_blocks_pad)
    if res is None:
        raise PlanCapacityError("dist_stream: early reduction "
                                "infeasible for a shard")
    slot_src, slot_q, xb, hot_cols, red = res
    n_tiles = xb.shape[0]
    want_tiles = pad_tiles if pad_tiles is not None else \
        max(16, -(-n_tiles // 16) * 16)
    if n_tiles > want_tiles:
        raise PlanCapacityError("dist_stream: shard exceeds common "
                                "gather tiles")
    padn = want_tiles - n_tiles
    if padn:
        slot_src = np.concatenate(
            [slot_src, np.full(padn * TILE, -1, np.int64)])
        slot_q = np.concatenate(
            [slot_q, np.full(padn * TILE, -1, np.int8)])
        xb = np.concatenate([xb, np.zeros(padn, np.int32)])
        red["src_route"] = np.concatenate(
            [red["src_route"],
             np.full((padn, LANES, LANES), -1, np.int32)])
        red["firstmask"] = np.concatenate(
            [red["firstmask"],
             np.zeros((padn, st.REDUCE_MAX_RUNS // LANES, LANES),
                      np.int8)])
        red["runstart"] = np.concatenate(
            [red["runstart"],
             np.zeros((padn, LANES, LANES), np.int8)])
    pad_tiles = want_tiles

    # deal tiles round-robin by partial count (as build_stream_plan)
    R_t = np.bincount(red["tile_of_part"], minlength=pad_tiles)
    order_t = np.argsort(-R_t, kind="stable")
    n_steps0 = pad_tiles // 8
    perm = np.empty(pad_tiles, np.int64)
    new_pos = ((np.arange(pad_tiles) % n_steps0) * 8
               + np.arange(pad_tiles) // n_steps0)
    perm[new_pos] = order_t
    slot_src = slot_src.reshape(pad_tiles, TILE)[perm].reshape(-1)
    slot_q = slot_q.reshape(pad_tiles, TILE)[perm].reshape(-1)
    xb = xb[perm]
    red["src_route"] = red["src_route"][perm]
    red["firstmask"] = red["firstmask"][perm]
    red["runstart"] = red["runstart"][perm]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(pad_tiles)
    red["tile_of_part"] = inv[red["tile_of_part"]]

    n_runs = red["n_runs"]
    Qp_need = max(8, -(-(int(red["p_of_part"].max()) + 1) // LANES
                       // 8) * 8)
    if Qp is None:
        s_pad_c = 64
        while (s_pad_c * LANES // pad_tiles // 8) * 8 < Qp_need \
                and s_pad_c < pad_tiles * 64 // LANES:
            s_pad_c *= 2
        Qp = min(st.REDUCE_MAX_RUNS // LANES,
                 max(Qp_need, (s_pad_c * LANES // pad_tiles // 8) * 8))
        s_pad = max(s_pad_c,
                    -(-(pad_tiles * Qp // LANES) // 8) * 8)
    elif Qp_need > Qp:
        raise PlanCapacityError("dist_stream: shard exceeds common Qp")

    t_of = red["tile_of_part"]
    tie = ((t_of.astype(np.uint64) * np.uint64(2654435761)
            + red["p_of_part"].astype(np.uint64) * np.uint64(40503))
           & np.uint64(0xFFFFFFFF))
    order = np.lexsort((tie, red["part_rows"]))
    rows_ranked = red["part_rows"][order]
    rank_of_part = np.empty(n_runs, np.int64)
    rank_of_part[order] = np.arange(n_runs)
    outslot = red["tile_of_part"] * (Qp * LANES) + red["p_of_part"]
    rank_of_slot = np.full(s_pad * TILE, -1, np.int64)
    rank_of_slot[outslot] = rank_of_part
    live = rank_of_slot >= 0
    n_items = n_runs

    kap0 = min(policy.kappa, 12288) if F_common is None else F_common
    # F_common forces the walk geometry: replay the SAME kappa the
    # reference shard settled on (stored in F_common's companion
    # levels; the caller passes kappa via policy? no — re-discover by
    # retrying until F <= F_common)
    kappas = [k for k in (kap0 if F_common is None else
                          min(policy.kappa, 12288),
                          12288, 10240, 8192, 6144, 4096, 3072, 2048,
                          1024, 512, 256)
              if isinstance(k, int)]
    last_err = None
    plan_sh = walk = None
    for kappa in kappas:
        k_starts, bases, r_starts, lrows = st._final_tile_walk(
            Ap, rows_ranked, kappa)
        F = k_starts.shape[0] - 1
        F_use = F_common if F_common is not None else F
        if F > F_use:
            continue  # smaller kappas only grow F; but first entries
            # may overshoot a forced F_common — keep trying larger?
        sizes = np.diff(k_starts)
        ftile_of_rank = np.repeat(np.arange(F, dtype=np.int64), sizes)
        dst_of_rank = (ftile_of_rank * TILE + np.arange(n_items)
                       - np.repeat(k_starts[:-1], sizes))
        dst_pos = np.full(rank_of_slot.shape[0], -1, dtype=np.int64)
        dst_pos[live] = dst_of_rank[rank_of_slot[live]]
        try:
            if levels is None:
                plan_sh = plan_shuffle_auto(dst_pos, F_use, sbt=8)
            else:
                plan_sh = plan_shuffle_multi(dst_pos, F_use,
                                             levels=levels, sbt=8)
        except ValueError as e:
            last_err = e
            continue
        walk = (k_starts, bases, r_starts, lrows)
        break
    if plan_sh is None:
        raise PlanCapacityError(f"dist_stream shuffle: {last_err}")
    k_starts, bases, r_starts, lrows = walk
    F = k_starts.shape[0] - 1
    F_use = F_common if F_common is not None else F
    if levels is None:
        # recover the level geometry for replay on other shards
        lv = []
        for p in plan_sh.passes[:-1]:
            region_tiles = (p.out_rows // p.K) // LANES
            lv.append((p.K, p.Q, region_tiles))
        levels = lv

    scan = st._plan_scan(plan_sh, k_starts, bases, r_starts, lrows,
                         rows_ranked)

    F_pad = -(-F_use // st.SBT_SCAN_MAX) * st.SBT_SCAN_MAX
    pf = F_pad - F

    def padt(a, fill):
        if pf == 0:
            return a
        return np.concatenate(
            [a, np.full((pf,) + a.shape[1:], fill, a.dtype)])

    scan = {k: padt(scan[k], 16384 if k == "relid" else 0)
            for k in scan}

    # uniform merge: per y2d row (R/128 blocks * 128? no — per y2d
    # 128-lane row), the FIRST contributing ycand row, plus fixup
    # pairs for extras (padded to a common count by the caller)
    NBY = -(-A.n_rows // LANES)
    fb = (bases // LANES).astype(np.int64)
    lo = (r_starts.astype(np.int64) // LANES)
    hi = (lrows.astype(np.int64) // LANES)
    merge_src = np.full(NBY, F_pad * LANES, dtype=np.int32)  # pad row
    extras = []
    for f in range(F):
        for b2 in range(int(lo[f]), int(hi[f]) + 1):
            r = f * LANES + int(b2 - fb[f])
            if merge_src[b2] == F_pad * LANES:
                merge_src[b2] = r
            else:
                extras.append((b2, r))

    c1, c2, c3 = route_tiles(red["src_route"], dedupe=False)
    HR = st.REDUCE_MAX_RUNS // LANES
    c3 = c3.copy()
    c3[:, :HR, :] |= (red["firstmask"].astype(np.uint8) << 7)

    Ax_slots = np.where(slot_src >= 0,
                        Ax[np.clip(slot_src, 0, max(nnz - 1, 0))], 0)
    split_meta = [dict(n_steps=p.n_steps, sbt=p.sbt, K=p.K, Q=p.Q,
                       out_rows=p.out_rows)
                  for p in plan_sh.passes]
    host = {
        "Ax": Ax_slots.astype(Ax.dtype).reshape(-1, LANES),
        "q": slot_q.reshape(-1, LANES),
        "xb": xb,
        "c1": c1.reshape(-1, LANES), "c2": c2.reshape(-1, LANES),
        "c3": c3.reshape(-1, LANES),
        # run-start bits for the generic-semiring reduce pass (the
        # roll-scan variant; plus_times/f32 ignores them)
        "rs": red["runstart"].reshape(-1, LANES),
        "merge_src": merge_src,
        **{f"scan_{k}": (scan[k].reshape(-1, LANES)
                         if scan[k].ndim > 1 else scan[k])
           for k in scan},
    }
    for i, p in enumerate(plan_sh.passes):
        n_steps, sbt_, K = p.starts.shape
        w = -(-(sbt_ * K) // LANES) * LANES
        rows_ = -(-n_steps // 8) * 8
        starts2 = np.zeros((rows_, w), dtype=np.int32)
        starts2[:n_steps, :sbt_ * K] = p.starts.reshape(n_steps, -1)
        host[f"sp{i}_s1"] = p.s1
        host[f"sp{i}_s2"] = p.s2
        host[f"sp{i}_s3"] = p.s3
        host[f"sp{i}_starts"] = starts2
        host[f"sp{i}_pos"] = p.pos
    geom = dict(pad_tiles=pad_tiles, Qp=Qp, s_pad=s_pad,
                out_rows=s_pad * LANES, F=F_use, F_pad=F_pad,
                levels=levels, split_meta=split_meta,
                x_blocks_pad=x_blocks_pad,
                n_aug=int(hot_cols.shape[0]))
    return host, extras, hot_cols, geom


def build_uniform_plans(A: CSR, plan: HaloPlan,
                        policy=None) -> UniformStreamPlans:
    n = plan.n_shards
    val_dtype = np.asarray(A.Ax).dtype
    if policy is None:
        from spmv_tpu.ops.tuning import policy_for

        policy = policy_for(np.dtype(val_dtype).itemsize)
    # shard-local x tables are built with the plain transpose inside
    # shard_map; the single-chip lane remap does not apply here
    policy = dataclasses.replace(policy, remap=False)
    locals_ = [_local_csr(plan, s, val_dtype) for s in range(n)]
    # The reference shard discovers the common geometry; the others
    # replay it. Feasibility under a replayed geometry is NOT monotone
    # in shard load (quota windows are per (tile, group) flow), so on
    # a replay failure the failing shard becomes the next reference —
    # in practice the most skewed shard binds and this converges in
    # one or two attempts. Exhausting the attempts raises
    # PlanCapacityError and callers fall back to the ELL path.
    # prepass: common gather-tile count and partial quota from every
    # shard's structure (a lighter shard can still need MORE tiles or
    # a deeper quota than the heaviest one)
    tiles_need, qp_need = 1, 8
    for c in locals_:
        Ap_ = np.asarray(c.Ap, np.int64)
        Aj_ = np.asarray(c.Aj, np.int64)
        rid = np.repeat(np.arange(c.n_rows, dtype=np.int64),
                        Ap_[1:] - Ap_[:-1])
        res = st._plan_gather_reduce(
            Aj_, rid, policy, -(-c.n_cols // (LANES * LANES)))
        if res is None:
            raise PlanCapacityError(
                "dist_stream: early reduction infeasible for a shard")
        _, _, xb_, _, red_ = res
        tiles_need = max(tiles_need, xb_.shape[0])
        qp_need = max(qp_need,
                      -(-(int(red_["p_of_part"].max()) + 1) // LANES
                        // 8) * 8)
    pad_tiles_c = max(16, -(-tiles_need // 16) * 16)
    s_pad_c = 64
    while (s_pad_c * LANES // pad_tiles_c // 8) * 8 < qp_need \
            and s_pad_c < pad_tiles_c * 64 // LANES:
        s_pad_c *= 2
    Qp_c = min(st.REDUCE_MAX_RUNS // LANES,
               max(qp_need, (s_pad_c * LANES // pad_tiles_c // 8) * 8))
    s_pad_c = max(s_pad_c, -(-(pad_tiles_c * Qp_c // LANES) // 8) * 8)

    tried: set = set()
    ref = int(np.argmax([c.nnz for c in locals_]))
    shards = extras = hotcols = geom = None
    for _attempt in range(min(n, 4)):
        tried.add(ref)
        h_ref, ex_ref, hc_ref, geom = _build_one(
            locals_[ref], policy, Qp=Qp_c, s_pad=s_pad_c,
            pad_tiles=pad_tiles_c)
        shards = [None] * n
        extras = [None] * n
        hotcols = [None] * n
        shards[ref], extras[ref], hotcols[ref] = h_ref, ex_ref, hc_ref
        failed = None
        for s in range(n):
            if s == ref:
                continue
            try:
                shards[s], extras[s], hotcols[s], _ = _build_one(
                    locals_[s], policy, F_common=geom["F"],
                    levels=geom["levels"], Qp=geom["Qp"],
                    s_pad=geom["s_pad"],
                    pad_tiles=geom["pad_tiles"])
            except PlanCapacityError:
                failed = s
                break
        if failed is None:
            break
        if failed in tried:
            raise PlanCapacityError(
                "dist_stream: no common shuffle geometry across shards")
        ref = failed
    else:
        raise PlanCapacityError(
            "dist_stream: no common shuffle geometry across shards")

    # common hot-page count
    n_aug = max(max(int(h.shape[0]) for h in hotcols), 0)
    n_aug = -(-n_aug // LANES) * LANES if n_aug else 0
    hot_stack = np.zeros((n, max(n_aug, 1)), np.int32)
    for s in range(n):
        hc = hotcols[s]
        if hc.size:
            hot_stack[s, :hc.size] = hc.astype(np.int32)

    # Fixups grouped BY DEPTH per y block (as stream.py's fix_levels):
    # a flat scatter computes every update from the OLD y2d, so two
    # extras hitting the same 128-row block would silently drop all but
    # one contribution (ADVICE r4 high). One scatter per depth keeps
    # indices within each scatter distinct; depths apply sequentially.
    per_depth: list = []  # per shard: list of depth -> [(b2, r)]
    for s in range(n):
        seen: dict = {}
        levels: list = []
        for b2, r in extras[s]:
            dpt = seen.get(b2, 0)
            seen[b2] = dpt + 1
            if dpt == len(levels):
                levels.append([])
            levels[dpt].append((b2, r))
        per_depth.append(levels)
    n_depth = max((len(lv) for lv in per_depth), default=0)
    n_fix = max((max((len(d) for d in lv), default=0)
                 for lv in per_depth), default=0)
    NBY = shards[0]["merge_src"].shape[0]
    fix_out = np.full((n, max(n_depth, 1), max(n_fix, 1)), NBY,
                      np.int32)  # oob = drop
    fix_src = np.zeros((n, max(n_depth, 1), max(n_fix, 1)), np.int32)
    for s in range(n):
        for dpt, lvl in enumerate(per_depth[s]):
            for i, (b2, r) in enumerate(lvl):
                fix_out[s, dpt, i] = b2
                fix_src[s, dpt, i] = r

    dev = {k: np.stack([shards[s][k] for s in range(n)])
           for k in shards[0]}
    dev["hot_cols"] = hot_stack
    dev["fix_out"] = fix_out
    dev["fix_src"] = fix_src
    return UniformStreamPlans(
        n=n, pad_tiles=geom["pad_tiles"],
        x_rows_pad=geom["x_blocks_pad"] * LANES,
        n_aug=n_aug, F_pad=geom["F_pad"], Qp=geom["Qp"],
        out_rows=geom["out_rows"], split_meta=geom["split_meta"],
        dev=dev, n_y_rows=plan.R)


@dataclasses.dataclass
class DistributedStreamSpMV:
    """Stream-pipeline distributed SpMV (any semiring; plus_times/f32
    takes the MXU prefix-difference fast kernels)."""

    mesh: Mesh
    axis: str
    plan: HaloPlan
    uni: UniformStreamPlans
    n_rows: int
    n_cols: int
    dev: dict
    unpad_idx: object  # unused (kept for dataclass shape parity)
    x_pad: int

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

    def matvec(self, x, semiring: Semiring = PLUS_TIMES) -> jax.Array:
        x = jnp.asarray(x)
        if x.shape[0] == self.n_cols and self.n_cols != self.x_pad:
            x = self.shard_x(x)
        u = self.uni
        meta = tuple((m["n_steps"], m["sbt"], m["K"], m["Q"],
                      m["out_rows"]) for m in u.split_meta)
        rs = self.plan.row_starts
        owned = tuple(int(rs[s + 1] - rs[s])
                      for s in range(self.plan.n_shards))
        return _dist_stream_matvec(
            self.dev, x,
            mesh=self.mesh, axis=self.axis, R=self.plan.R,
            B=self.plan.B, n_tiles=u.pad_tiles,
            x_rows_pad=u.x_rows_pad, n_aug=u.n_aug, Qp=u.Qp,
            out_rows=u.out_rows, F_pad=u.F_pad, split_meta=meta,
            owned=owned, sr=semiring,
            interpret=config.use_interpret(),
            export_meta=(tuple(int(r) for r in self.plan.export_rows),
                         bool(self.plan.export_flag.any())),
        )


@functools.partial(jax.jit, static_argnames=(
    "mesh", "axis", "R", "B", "n_tiles", "x_rows_pad", "n_aug", "Qp",
    "out_rows", "F_pad", "split_meta", "owned", "sr", "interpret",
    "export_meta"))
def _dist_stream_matvec(dev, x, *, mesh, axis, R, B,
                        n_tiles, x_rows_pad, n_aug, Qp, out_rows,
                        F_pad, split_meta, owned, sr, interpret,
                        export_meta):
    n = mesh.shape[axis]
    export_rows, any_export = export_meta
    val_dtype = dev["Ax"].dtype
    identity = float(sr.identity_for(np.dtype(val_dtype)))

    def local(d, x_l):
        xl = x_l[0] if x_l.ndim > 1 else x_l
        # halo exchange (value-only all_to_all; overlaps with nothing
        # upstream but the x2d prep below has no dependency on it —
        # XLA schedules them concurrently)
        send = jnp.take(xl, d["send_idx"][0].reshape(-1)).reshape(
            d["send_idx"][0].shape)
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=False)
        x_loc = jnp.concatenate([xl, recv.reshape(-1)])
        # transposed x table + hot-column broadcast pages
        xp = jnp.pad(x_loc, (0, x_rows_pad * LANES - x_loc.shape[0]))
        x2d = jnp.swapaxes(
            xp.reshape(-1, LANES, LANES), 1, 2).reshape(-1, LANES)
        if n_aug:
            hot_x = jnp.take(x_loc, d["hot_cols"][0])
            aug = jnp.broadcast_to(
                hot_x.reshape(-1, 1, LANES),
                (n_aug // LANES, LANES, LANES)).reshape(-1, LANES)
            x2d = jnp.concatenate([x2d, aug], axis=0)

        part = st._reduce_pass(
            x2d, d["Ax"][0], d["q"][0], d["xb"][0],
            d["c1"][0], d["c2"][0], d["c3"][0], d["rs"][0],
            sr=sr, sbt=8, n_tiles=n_tiles, Qp=Qp, out_rows=out_rows,
            interpret=interpret)
        cur = part
        for i, (n_steps, sbt_, K, Q, orows) in enumerate(split_meta):
            cur = _run_split(
                cur, d[f"sp{i}_s1"][0], d[f"sp{i}_s2"][0],
                d[f"sp{i}_s3"][0], d[f"sp{i}_starts"][0],
                d[f"sp{i}_pos"][0], n_steps=n_steps, sbt=sbt_, K=K,
                Q=Q, rows_per_g=orows // K,
                interpret=interpret).reshape(orows, LANES)
        if cur.shape[0] < F_pad * LANES:
            cur = jnp.pad(cur, ((0, F_pad * LANES - cur.shape[0]),
                                (0, 0)))
        ycand = st._scan_pass(
            cur, d["scan_relid"][0],
            d["scan_pm1"][0], d["scan_pm2"][0], d["scan_pm3"][0],
            d["scan_r2s1"][0], d["scan_r2s2"][0], d["scan_r2s3"][0],
            d["scan_q2s1"][0], d["scan_q2s2"][0], d["scan_q2s3"][0],
            d["scan_valid2"][0], d["scan_counts"][0],
            sr=sr, F_pad=F_pad, interpret=interpret)
        # uniform merge: row-gather by merge_src (+ identity pad row),
        # then the rare extra contributors as oob-droppable fixups
        ycp = jnp.concatenate(
            [ycand, jnp.full((1, LANES), identity, ycand.dtype)],
            axis=0)
        y2d = jnp.take(ycp, d["merge_src"][0], axis=0)
        # one scatter per depth level: indices within a level are
        # distinct per block, so each update reads the y2d that
        # already holds the previous depth's contribution
        fo_all, fs_all = d["fix_out"][0], d["fix_src"][0]
        for dpt in range(fo_all.shape[0]):
            fo, fs = fo_all[dpt], fs_all[dpt]
            upd = sr.reduce(jnp.take(y2d, fo, axis=0, mode="fill",
                                     fill_value=identity),
                            jnp.take(ycp, fs, axis=0))
            y2d = y2d.at[fo].set(upd, mode="drop")
        y = y2d.reshape(-1)[:R]

        # owned block = a CONTIGUOUS window of local y (ownership and
        # touch ranges are both contiguous): a dynamic slice at the
        # per-shard offset + the plan's validity mask — NOT an
        # R_out-element gather (jnp.take at element granularity
        # measured 0.12 G elems/s = ~8 ms on a 1M-row shard)
        R_out_ = d["own_valid"].shape[-1]
        # off can be NEGATIVE (owned rows before the first touched
        # row): pad on both sides so the dynamic slice never clamps
        yp = jnp.concatenate(
            [jnp.full((R_out_,), identity, y.dtype), y,
             jnp.full((R_out_,), identity, y.dtype)])
        win = jax.lax.dynamic_slice_in_dim(
            yp, d["own_off"][0, 0] + R_out_, R_out_)
        y_own = jnp.where(d["own_valid"][0] > 0, win, identity)
        if any_export:
            parts = jax.lax.all_gather(y[:1], axis, tiled=True)
            er = np.asarray(export_rows)
            order = np.argsort(er, kind="stable")
            er_sorted = er[order]
            uniq, seg_of = np.unique(er_sorted, return_inverse=True)
            from spmv_tpu.ops.semiring import segment_reduce_sorted

            ps = jnp.take(parts, jnp.asarray(order))
            ps = jnp.where(jnp.asarray(er_sorted >= 0), ps, identity)
            comb = segment_reduce_sorted(
                ps, jnp.asarray(seg_of.astype(np.int32)), len(uniq),
                sr, identity)
            keep = np.nonzero(uniq >= 0)[0]
            if keep.size:
                comb_v = jnp.take(comb, jnp.asarray(keep))
                pos = jnp.asarray(uniq[keep]) - d["own_start"][0, 0]
                pos = jnp.where(pos >= 0, pos, y_own.shape[0])
                old = jnp.take(y_own, pos, mode="fill",
                               fill_value=identity)
                y_own = y_own.at[pos].set(sr.reduce(old, comb_v),
                                          mode="drop")
        # the oracle's acc = initialize() participates in every row
        # (parity with _stream_spmv's final fold; matters for rings
        # whose identity is not absorbing over the data range)
        y_own = sr.reduce(y_own, jnp.full_like(y_own, identity))
        return y_own[None, :]

    specs = {k: P(axis, *([None] * (v.ndim - 1)))
             for k, v in dev.items()}
    y_sharded = shard_map(
        lambda d, xs: local(d, xs),
        mesh=mesh,
        in_specs=(specs, P(axis)),
        out_specs=P(axis, None),
        check_vma=False,
    )(dev, x)
    # global y = concat of each shard's owned prefix (static slices;
    # the flat n_rows-element gather this replaces costs ~8 ms/M rows)
    R_out = y_sharded.shape[-1]
    out = jnp.concatenate(
        [y_sharded[s_, :c] for s_, c in enumerate(owned)])
    return out


def distribute_stream(A: CSR, mesh: Mesh, axis: str = "shards",
                      balance: str = "nnz",
                      policy=None) -> DistributedStreamSpMV:
    """Build the stream-pipeline distributed SpMV. Raises
    PlanCapacityError when a shard cannot fit the common geometry —
    callers fall back to `distribute_csr` (the ELL path)."""
    n = mesh.shape[axis]
    plan = build_halo_plan(A, n, balance=balance)
    uni = build_uniform_plans(A, plan, policy=policy)

    from spmv_tpu.parallel.bootstrap import put_global

    shd = NamedSharding(mesh, P(axis))
    dev = {k: put_global(np.asarray(v), shd) for k, v in uni.dev.items()}
    dev["send_idx"] = put_global(plan.send_idx, shd)
    dev["own_start"] = put_global(
        plan.row_starts[:n, None].astype(np.int32), shd)
    # owned window: idx_own is contiguous wherever valid (global row
    # own_starts+j lives at local slot own_starts+j-ftr), so ship the
    # per-shard OFFSET + validity mask instead of an R_out-wide
    # element-gather index (VERDICT r3 item 5-adjacent: the element
    # gather is the XLA 0.12 G elems/s cliff)
    own_off = np.zeros((n, 1), np.int32)
    for s in range(n):
        v = np.nonzero(plan.idx_own[s] >= 0)[0]
        if v.size:
            own_off[s, 0] = plan.idx_own[s][v[0]] - v[0]
    dev["own_off"] = put_global(own_off, shd)
    dev["own_valid"] = put_global(
        (plan.idx_own >= 0).astype(np.int8), shd)

    return DistributedStreamSpMV(
        mesh=mesh, axis=axis, plan=plan, uni=uni,
        n_rows=A.n_rows, n_cols=A.n_cols, dev=dev,
        unpad_idx=None, x_pad=n * plan.B)
