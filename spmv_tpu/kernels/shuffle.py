"""Planned-permutation (shuffle) engine: route elements of a flat
device array into a plan-chosen order at streaming speed.

This is the TPU replacement for fine-grained scatter/gather: a known
bijection (with don't-care padding) is decomposed at plan time into
**split passes**. Each pass is one Pallas kernel whose grid walks input
superblocks of `sbt` (128,128) tiles; every tile is arbitrarily
permuted in-register (3-stage routing, ops/routing.py) into
destination-group-sorted order, and each of K groups' Q-row quota
windows per tile is DMA'd to that group's dedicated output array
(K out_specs -> all DMAs pipeline across a short 1-D grid). A cheap
XLA concat/interleave stitches the K arrays into the next pass's input
order. Two passes reach ~4M elements; the consumer applies one final
in-register tile-perm for exact order.

Quota windows copy Q*128 contiguous elements starting at a dynamic row
offset, so they carry *edge junk* (neighbouring groups' elements); the
plan simulates every pass exactly and treats those slots as junk
downstream. Only the final consumer masks junk (it knows live slots).

Reference analog: the GPU merge kernel's shared-memory staging and
scattered writes (ref: merge_based/agent_spmv_orig.cuh:454-679,
agent_segment_fixup.cuh) — on TPU the routing is decided ahead of time
and becomes streaming DMA + in-register lane gathers/transposes.
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
from spmv_tpu.ops.routing import route_tiles

LANES = 128
TILE = LANES * LANES


@dataclasses.dataclass
class SplitPass:
    n_steps: int
    sbt: int  # input tiles per step
    K: int    # destination groups = output arrays
    Q: int    # quota rows per (tile, group)
    in_rows: int
    # stitching of the K output arrays into consumer order:
    # "concat"      -> concat over k (pass 1: regions)
    # (G, spr)      -> interleave: final tile f = region*K + k drawn
    #                  from array k blocks region*spr..+spr
    stitch: object
    s1: np.ndarray  # (n_steps*sbt*128, 128) u8 routing stages
    s2: np.ndarray
    s3: np.ndarray
    starts: np.ndarray  # (n_steps, sbt, K) i32 window start row


@dataclasses.dataclass
class ShufflePlan:
    passes: list
    in_rows: int
    out_rows: int
    # Ground truth from simulation: slot_of_dst[d] = final flat slot
    # holding the element whose requested destination was d (-1 if the
    # destination was never requested).
    slot_of_dst: np.ndarray


def _plan_split(cur: np.ndarray, grp: np.ndarray, n_groups: int,
                sbt: int, Q: int, stitch, out_flat_base):
    """Plan one split pass and simulate its stitched output layout.

    cur: (slots,) int64 payload per input slot, -1 junk.
    grp: (slots,) destination group per slot (ignored where junk).
    out_flat_base(step, g, j) -> flat output element index of the start
    of the (step, group, tile-j) quota window in CONSUMER order.
    """
    slots = cur.shape[0]
    assert slots % (sbt * TILE) == 0, "input must align to superblocks"
    n_tiles = slots // TILE
    n_steps = n_tiles // sbt
    blk_rows = sbt * Q
    out_rows = n_steps * n_groups * blk_rows

    g_eff = np.where(cur >= 0, grp, n_groups)  # junk sorts last
    src = np.full((n_tiles, LANES, LANES), -1, dtype=np.int32)
    starts = np.zeros((n_steps, sbt, n_groups), dtype=np.int32)
    new_cur = np.full(out_rows * LANES, -1, dtype=np.int64)

    cur_t = cur.reshape(n_tiles, TILE)
    g_t = g_eff.reshape(n_tiles, TILE)

    for t in range(n_tiles):
        order = np.lexsort((cur_t[t], g_t[t]))  # by (group, payload)
        gs = g_t[t][order]
        n_live = int(np.searchsorted(gs, n_groups))
        src[t].reshape(-1)[:n_live] = order[:n_live]
        bounds = np.searchsorted(gs[:n_live], np.arange(n_groups + 1))
        step, j = divmod(t, sbt)
        for g in range(n_groups):
            b, e = int(bounds[g]), int(bounds[g + 1])
            c = e - b
            st = min(b // LANES, LANES - Q)
            if c and (b + c) > (st + Q) * LANES:
                raise ValueError(
                    f"split quota overflow: tile {t} group {g} count {c} "
                    f"exceeds a {Q}-row window at start {st}")
            starts[step, j, g] = st
            if c:
                base = out_flat_base(step, g, j)
                woff = b - st * LANES
                new_cur[base + woff:base + woff + c] = cur_t[t][order[b:e]]

    s1, s2, s3 = route_tiles(src)
    p = SplitPass(
        n_steps=n_steps, sbt=sbt, K=n_groups, Q=Q,
        in_rows=slots // LANES, stitch=stitch,
        s1=s1.reshape(-1, LANES), s2=s2.reshape(-1, LANES),
        s3=s3.reshape(-1, LANES), starts=starts)
    return p, new_cur


def plan_shuffle(dst_pos: np.ndarray, n_final_tiles: int, n_regions: int,
                 sbt: int = 8, q1: int = 8) -> ShufflePlan:
    """Plan a 2-pass shuffle.

    dst_pos: (in_rows*128,) int64; per input slot, the requested
    destination flat position over `n_final_tiles` (128,128) output
    tiles, or -1 for input junk. Destinations must be injective. The
    engine guarantees each destination TILE ends up holding exactly its
    elements; the within-tile slot arrangement is reported in
    `slot_of_dst` (consumers finish with one tile-perm).

    n_regions: pass-1 group count G. Final tiles are assigned to
    regions ROUND-ROBIN (f % G), so runs of consecutive destination
    tiles (e.g. one heavy row's tiles) spread across regions instead of
    concentrating one region's quota windows. Raises ValueError on
    quota overflow — callers retry with more regions / other geometry.
    """
    slots = dst_pos.shape[0]
    if slots % (sbt * TILE) != 0:
        raise ValueError("input slots must be a multiple of sbt*16384")
    n_tiles_in = slots // TILE
    n_steps1 = n_tiles_in // sbt
    region_tiles = (n_steps1 * sbt * q1) // LANES
    if region_tiles * LANES != n_steps1 * sbt * q1 or LANES % region_tiles:
        raise ValueError(
            f"geometry: region_tiles={region_tiles} must divide 128; "
            f"pad input (tiles={n_tiles_in}) or adjust q1")
    q2 = LANES // region_tiles
    if region_tiles % sbt:
        raise ValueError("region_tiles must be a multiple of sbt")
    spr = region_tiles // sbt  # pass-2 steps per region

    F = int(n_final_tiles)
    G = int(n_regions)
    g_size = -(-F // G)
    F_pad = G * g_size

    if dst_pos.size and dst_pos.max() >= F * TILE:
        raise ValueError("dst_pos out of range")
    dst_tile = np.where(dst_pos >= 0, dst_pos // TILE, -1)
    grp1 = np.where(dst_tile >= 0, dst_tile % G, 0)  # round-robin

    # pass 1 consumer order: regions concatenated over g
    region_elems = n_steps1 * sbt * q1 * LANES
    blk1 = sbt * q1 * LANES

    def base1(step, g, j):
        return g * region_elems + step * blk1 + j * q1 * LANES

    p1, mid = _plan_split(dst_pos, grp1, G, sbt, q1, "concat", base1)

    # pass 2: region g holds final tiles {f : f % G == g}; local slot
    # k corresponds to f = k*G + region, so stitching is a plain
    # (K, G, ...) reshape — f-major without any transpose.
    grp2 = np.where(mid >= 0, (mid // TILE) // G, 0)
    blk2 = sbt * q2 * LANES

    def base2(step, k, j):
        region, s = divmod(step, spr)
        f = k * G + region
        return f * TILE + s * blk2 + j * q2 * LANES

    p2, fin = _plan_split(mid, grp2, g_size, sbt, q2, (G, spr), base2)

    slot_of_dst = np.full(F * TILE, -1, dtype=np.int64)
    liv = fin >= 0
    fl = fin[liv]
    keep = fl < F * TILE
    slot_of_dst[fl[keep]] = np.nonzero(liv)[0][keep]
    return ShufflePlan(passes=[p1, p2], in_rows=slots // LANES,
                       out_rows=F_pad * LANES, slot_of_dst=slot_of_dst)


def _split_kernel(sbt: int, K: int, Q: int):
    def kernel(starts_ref, data_ref, s1_ref, s2_ref, s3_ref, *refs):
        out_refs, scratch = refs[:-1], refs[-1]
        t = pl.program_id(0)
        for j in range(sbt):
            tile = data_ref[j * LANES:(j + 1) * LANES, :]
            i1 = s1_ref[j * LANES:(j + 1) * LANES, :].astype(jnp.int32)
            i2 = s2_ref[j * LANES:(j + 1) * LANES, :].astype(jnp.int32)
            i3 = s3_ref[j * LANES:(j + 1) * LANES, :].astype(jnp.int32)
            a = jnp.take_along_axis(tile, i1, axis=1).T
            a = jnp.take_along_axis(a, i2, axis=1).T
            scratch[j * LANES:(j + 1) * LANES, :] = \
                jnp.take_along_axis(a, i3, axis=1)
        for k in range(K):
            for j in range(sbt):
                st = starts_ref[t, j, k]
                out_refs[k][j * Q:(j + 1) * Q, :] = \
                    scratch[pl.ds(j * LANES + st, Q), :]

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "n_steps", "sbt", "K", "Q", "interpret"))
def _run_split(data, s1, s2, s3, starts, *, n_steps, sbt, K, Q, interpret):
    blk_rows = sbt * Q
    in_rows_blk = sbt * LANES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((in_rows_blk, LANES),
                               lambda t, starts: (t, 0))] * 4,
        out_specs=[pl.BlockSpec((blk_rows, LANES),
                                lambda t, starts: (t, 0))] * K,
        scratch_shapes=[pltpu.VMEM((sbt * LANES, LANES), data.dtype)],
    )
    return pl.pallas_call(
        _split_kernel(sbt, K, Q),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_steps * blk_rows, LANES),
                                        data.dtype) for _ in range(K)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(starts, data, s1, s2, s3)


def shuffle_device_arrays(plan: ShufflePlan) -> list:
    """Upload plan arrays once; returns a list of per-pass dicts."""
    return [{
        "s1": jnp.asarray(p.s1), "s2": jnp.asarray(p.s2),
        "s3": jnp.asarray(p.s3), "starts": jnp.asarray(p.starts),
    } for p in plan.passes]


def _stitch(outs, p: SplitPass):
    if p.stitch == "concat":
        return jnp.concatenate(outs, axis=0)
    # round-robin regions: array k holds final tiles f = k*G + region,
    # so concatenating the K arrays IS f-major order.
    return jnp.concatenate(outs, axis=0)


def apply_shuffle(data: jax.Array, plan: ShufflePlan, dev: list):
    """Run all passes; data: (in_rows, 128) -> (out_rows, 128)."""
    x = data
    for p, d in zip(plan.passes, dev):
        outs = _run_split(x, d["s1"], d["s2"], d["s3"], d["starts"],
                          n_steps=p.n_steps, sbt=p.sbt, K=p.K, Q=p.Q,
                          interpret=config.use_interpret())
        x = _stitch(outs, p)
    return x
