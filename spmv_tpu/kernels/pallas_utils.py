"""Shared Pallas/Mosaic building blocks for the SpMV kernel zoo.

TPU translations of the reference's intra-kernel primitives:

- warp shuffle tree reduction (ref: cusp/utils.cuh:38-47) →
  log-step `pltpu.roll` reductions across the 128-lane dimension
- block-wide reduce-by-key scan (ref: merge_based/agent_spmv_orig.cuh:
  388-404, CUB BlockScan with ReduceByKeyOp) → segmented
  Hillis-Steele scan over (sublane, lane) tiles with a cross-sublane
  carry phase
- per-thread merge-path item walk (ref: agent_spmv_orig.cuh:340-384)
  → fully vectorized scan + row-end gather; the divergent
  accumulate-or-reset branch becomes predicated segment masks
- shared-memory scatter/gather staging (ref: agent_spmv_orig.cuh:
  454-679) → select-based in-tile gather (`gather_flat`), since
  Mosaic exposes only lane-wise and same-shape-sublane gathers

Everything is semiring-generic: reductions take (reduce, identity)
rather than assuming (+, 0) — the reference achieves this with its
functor_t template parameter (ref: merge_genl/agent_spmv_orig.cuh:
98-124); here it is function composition over traced code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def sublane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def flat_iota(shape):
    """Row-major flat index over the trailing (sublanes, lanes) dims."""
    return sublane_iota(shape) * shape[-1] + lane_iota(shape)


def segmented_scan_tile(v, seg, reduce_fn, identity):
    """Inclusive segmented scan over a (S, 128) tile in row-major order.

    `seg` (int32, same shape) holds non-decreasing segment ids in
    row-major order; the scan resets at segment boundaries. `reduce_fn`
    must be associative with the given identity.

    This is the TPU replacement for CUB's BlockScan<ReduceByKeyOp>
    (ref: merge_based/agent_spmv_orig.cuh:388-404): lane phase =
    7 log-steps of roll+mask (the shuffle-scan analog), sublane phase =
    a log-step carry propagation across sublanes (the cross-warp smem
    phase analog).
    """
    S, L = v.shape
    assert L == LANES
    lanes = lane_iota(v.shape)

    # Phase 1: segmented scan within each sublane (along lanes).
    d = 1
    while d < LANES:
        sv = pltpu.roll(v, d, 1)
        ss = pltpu.roll(seg, d, 1)
        ok = (lanes >= d) & (ss == seg)
        v = jnp.where(ok, reduce_fn(v, sv), v)
        d *= 2

    if S == 1:
        return v

    # Phase 2: carry across sublanes. For sublane s the carry-in is the
    # reduction of tail-segment totals of previous sublanes whose
    # segment runs contiguously into this sublane's first element.
    last_v = jnp.broadcast_to(v[:, LANES - 1 : LANES], (S, LANES))
    first_seg = jnp.broadcast_to(seg[:, 0:1], (S, LANES))
    last_seg = jnp.broadcast_to(seg[:, LANES - 1 : LANES], (S, LANES))
    subl = sublane_iota(v.shape)

    ident = jnp.full_like(v, identity)
    # w=1 init: carry from immediate predecessor.
    prev_last_v = pltpu.roll(last_v, 1, 0)
    prev_last_seg = pltpu.roll(last_seg, 1, 0)
    prev_first_seg = pltpu.roll(first_seg, 1, 0)
    linked = (subl >= 1) & (prev_last_seg == first_seg)
    carry = jnp.where(linked, prev_last_v, ident)
    # open = the whole predecessor sublane is one segment linked to us.
    # Kept as int32 0/1: Mosaic cannot rotate i1 vectors.
    open_ = (linked & (prev_first_seg == prev_last_seg)).astype(jnp.int32)

    w = 1
    while w < S:
        in_range = subl >= w  # rolled values wrap below sublane w
        c_shift = jnp.where(in_range, pltpu.roll(carry, w, 0), identity)
        o_shift = jnp.where(in_range, pltpu.roll(open_, w, 0), 0)
        carry = jnp.where(open_ > 0, reduce_fn(c_shift, carry), carry)
        open_ = open_ * o_shift
        w *= 2

    # Apply carry to each sublane's first segment.
    apply_mask = seg == first_seg
    v = jnp.where(apply_mask, reduce_fn(v, carry), v)
    return v


def segmented_scan_lanes(v, head, reduce_fn):
    """Inclusive segmented scan ALONG LANES only (no cross-sublane
    carry), flag-based (Blelloch): `head` (int, same shape) is 1 at
    each segment's first lane. Each sublane scans independently.

    7 log-steps of roll+select — no segment-id materialization and no
    sublane carry phase. Correct whenever segments never span sublanes
    (the early-reduction run layout guarantees this: every sublane's
    first live lane starts a run, _plan_gather_reduce)."""
    lanes = lane_iota(v.shape)
    f = head.astype(jnp.int32)
    d = 1
    while d < LANES:
        sv = pltpu.roll(v, d, 1)
        sf = pltpu.roll(f, d, 1)
        in_range = lanes >= d
        ok = in_range & (f == 0)
        v = jnp.where(ok, reduce_fn(sv, v), v)
        f = jnp.where(in_range, f | sf, f)
        d *= 2
    return v


def unsegmented_scan_tile(v, add_fn=None):
    """Inclusive scan (cumsum-style) over a (S, 128) tile, row-major.

    Fast path used by the plus_times ring where prefix differences are
    valid. add_fn defaults to +.
    """
    if add_fn is None:
        add_fn = lambda a, b: a + b
    S, L = v.shape
    lanes = lane_iota(v.shape)
    d = 1
    while d < LANES:
        sv = pltpu.roll(v, d, 1)
        v = jnp.where(lanes >= d, add_fn(v, sv), v)
        d *= 2
    if S == 1:
        return v
    # Exclusive Hillis-Steele scan of sublane totals gives each
    # sublane's carry-in.
    tot = jnp.broadcast_to(v[:, LANES - 1 : LANES], (S, LANES))
    subl = sublane_iota(v.shape)
    carry = jnp.where(subl >= 1, pltpu.roll(tot, 1, 0), 0.0)
    w = 1
    while w < S:
        c_shift = pltpu.roll(carry, w, 0)
        carry = jnp.where(subl >= w + 1, add_fn(carry, c_shift), carry)
        w *= 2
    return add_fn(v, carry)


def segmented_scan_sublanes(v, seg, reduce_fn, identity):
    """Inclusive segmented scan DOWN the sublane axis of a (S, 128)
    tile: each lane accumulates independently; `seg` (int32, same
    shape) holds per-sublane segment ids, non-decreasing along axis 0.

    This is the SpMM orientation of segmented_scan_tile: values are
    whole 128-wide rows (one dense-block row per nonzero), so the
    reduce-by-key runs across sublanes (log2(S) roll steps)."""
    S, L = v.shape
    subl = sublane_iota(v.shape)
    d = 1
    while d < S:
        sv = pltpu.roll(v, d, 0)
        ss = pltpu.roll(seg, d, 0)
        ok = (subl >= d) & (ss == seg)
        v = jnp.where(ok, reduce_fn(v, sv), v)
        d *= 2
    return v


def gather_flat(v, idx, identity):
    """out[p, j] = v_flat[idx[p, j]], with idx < 0 yielding `identity`.

    v: (S, 128) tile; idx: (P, 128) int32 of row-major flat indices into
    v. Mosaic has no arbitrary gather, so this runs S lane-gathers
    (take_along_axis on the 128-lane dim is supported) and selects by
    source sublane — the TPU version of the smem-staged scatter/gather
    in the reference's ConsumeTile (ref: agent_spmv_orig.cuh:454-679).
    """
    S, L = v.shape
    P = idx.shape[0]
    lane_idx = jnp.where(idx >= 0, idx % LANES, 0)
    sub_idx = jnp.where(idx >= 0, idx // LANES, -1)
    out = jnp.full(idx.shape, identity, dtype=v.dtype)
    for s in range(S):
        row = jnp.broadcast_to(v[s : s + 1, :], (P, LANES))
        cand = jnp.take_along_axis(row, lane_idx, axis=1)
        out = jnp.where(sub_idx == s, cand, out)
    return out


def batched_transpose(a):
    """Per-(128,128)-tile transpose of a stacked (nt*128, 128) array."""
    nt = a.shape[0] // LANES
    if nt == 1:
        return a.T
    return jnp.concatenate(
        [a[i * LANES:(i + 1) * LANES, :].T for i in range(nt)], axis=0)


def route3_batched(v, s1, s2, s3):
    """3-stage tile routing (ops/routing.py decomposition) over nt
    stacked (128,128) tiles with BATCHED lane gathers: one
    (nt*128, 128) take_along_axis costs ~3.5x less per tile than nt
    separate gathers (measured, scripts/probe_tile_ops.py) because the
    per-op issue overhead amortizes. Transposes stay per-tile (they
    must not cross tile boundaries); gathers are row-local so batching
    is exact."""
    a = jnp.take_along_axis(v, s1.astype(jnp.int32), axis=1)
    a = batched_transpose(a)
    a = jnp.take_along_axis(a, s2.astype(jnp.int32), axis=1)
    a = batched_transpose(a)
    return jnp.take_along_axis(a, s3.astype(jnp.int32), axis=1)


def masked_reduce_scalar(v, mask, reduce_array_fn, identity):
    """Reduce the elements of v where mask holds, to a scalar."""
    masked = jnp.where(mask, v, identity)
    return reduce_array_fn(masked)


def strided_group_reduce(v, group_lanes: int, reduce_fn):
    """Reduce within lane groups of width `group_lanes` (a power of 2).

    After the call, the FIRST lane of each group holds the group's
    reduction (other lanes hold partials). This is the warp-shuffle
    tree reduction analog (ref: cusp/utils.cuh:38-47): log2(W) steps of
    roll-by-stride, each lane combining with its neighbor `d` to the
    right within the group.
    """
    S, L = v.shape
    lanes = lane_iota(v.shape)
    d = group_lanes // 2
    while d >= 1:
        sv = pltpu.roll(v, (LANES - d) % LANES, 1)  # bring lane j+d to lane j
        ok = (lanes % group_lanes) < d
        v = jnp.where(ok, reduce_fn(v, sv), v)
        d //= 2
    return v
