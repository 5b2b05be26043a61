"""Planned paged gather: x[idx] for arbitrary flat index streams at
device speed — the direct-tier replacement for XLA's element gather.

`jnp.take` at element granularity runs ~0.12 G elems/s on this chip
(scripts/tpu_probe.py) — the round-4 fallback cliff: merge_tiled /
the ELL kinds spent 40-70 ms per matvec in their phase-A x gather
(VERDICT r4 item 2). The only fast per-element moves are lane gathers
within a sublane row, dynamic sublane slices, and planned
within-(128,128)-tile routes (docs/DESIGN_stream.md). This module
composes exactly those:

Plan (host, O(n)):
  - x lives as the standard windowed transposed table (one (128,128)
    block per 16K-column window: xt_w[s, q] = x[w*16384 + q*128 + s]),
    VMEM-resident (plan refuses tables past the budget);
  - the index stream is cut into 16384-element chunks (one route tile
    each); within a chunk, elements bucket by idx mod 128 (their
    sublane in every window block). Bucket overflow past 128 lanes
    spills to round r+1 — R = max rounds, typically 2 for random
    streams (Poisson(128) max over 128 buckets);
  - per (chunk, round): slot (s, l) holds the l-th element of bucket
    s; `qlo` = the element's lane within its window block; `qhi` = its
    window; an injective 3-stage route returns gathered values from
    slot positions to original positions (liveness rides bit 7 of the
    route's last stage);
  - per (chunk, round): the list of DISTINCT windows touched — the
    kernel sweeps only those (structured streams touch 1-2 windows;
    fully random streams touch them all).

Kernel (Pallas): per chunk and round, a dynamic-trip page loop: slice
the resident table at the window's 128-row block (dynamic sublane
slice, the `_xwin` move), lane-gather by qlo, select by qhi == window;
then route to original positions and merge rounds.

Reference analog: the GPU solves this with the texture cache / smem
staging (ref: merge_based/agent_spmv_orig.cuh:454-536,
LightSpMV.cuh:60-88); on TPU the locality is planned instead.
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
from spmv_tpu.kernels.pallas_utils import LANES
from spmv_tpu.ops.routing import TILE, route_tiles

R_MAX = 4  # rounds; past this the stream is adversarially bucketed
# (e.g. all columns ≡ c mod 128) and the caller keeps jnp.take


@dataclasses.dataclass
class PagedGatherPlan:
    n: int                # elements in the original stream
    n_chunks: int
    rounds: int
    k_max: int            # widest per-(chunk, round) page list
    n_w: int              # windows in the x table
    # device arrays
    qlo: jax.Array        # (C*R*128, 128) uint8 lane within window
    qhi: jax.Array        # (C*R*128, 128) int32 window id (-1 dead)
    s1: jax.Array         # (C*R*128, 128) uint8 route stages
    s2: jax.Array
    s3: jax.Array         # bit 7 = original-position liveness
    pages: jax.Array      # (C*R, k_max) int32 window ids to sweep
    pcnt: jax.Array       # (C*R,) int32 live pages per (chunk, round)
    pmask: jax.Array      # (C, n_words) int32 bitmap of windows any
    # round of the chunk touches — the kernel's static page sweep
    # skips clear bits at scalar cost


def build_paged_gather_plan(idx: np.ndarray, n_cols: int,
                            val_bytes: int = 4):
    """Plan x[idx] for a flat idx stream (-1 = dead slot, yields 0).

    Returns None when the x table exceeds the VMEM budget or bucket
    spill needs more than R_MAX rounds — callers keep the XLA gather.
    """
    idx = np.asarray(idx).reshape(-1)
    n = idx.shape[0]
    if n == 0 or n_cols == 0:
        return None
    W = LANES * LANES
    n_w = -(-n_cols // W)
    # the sweep streams one 32-window block per grid step (the table
    # need not be VMEM-resident), so the only cap is the sweep length
    # for fully-random streams: past ~64M source elements the
    # per-chunk full sweep stops paying vs the XLA gather
    if n_w > 4096:
        return None
    C = -(-n // TILE)
    pad = C * TILE - n
    idxp = np.concatenate(
        [idx.astype(np.int64), np.full(pad, -1, np.int64)])
    live = idxp >= 0
    pos = np.nonzero(live)[0]
    if pos.size == 0:
        return None
    chunk = pos // TILE
    sub = idxp[pos] % LANES
    # stable bucket fill: position within (chunk, sub)
    key = chunk * LANES + sub
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    starts = np.searchsorted(key_s, key_s, side="left")
    pib = np.arange(pos.size) - starts  # position in bucket
    rnd = pib // LANES
    lane = pib % LANES
    R = int(rnd.max()) + 1
    if R > R_MAX:
        return None
    # inverse the order so per-position arrays line up
    inv = np.empty_like(order)
    inv[order] = np.arange(order.size)
    rnd = rnd[inv]
    lane = lane[inv]

    qlo = np.zeros((C, R, LANES, LANES), np.uint8)
    # qhi slots with no element get window -1: they match no swept
    # page, so unassigned slots never alias a real window's gather
    qhi = np.full((C, R, LANES, LANES), -1, np.int32)
    src = np.full((C, R, TILE), -1, np.int32)
    w_of = idxp[pos] // W
    l_of = (idxp[pos] // LANES) % LANES
    qlo[chunk, rnd, sub, lane] = l_of.astype(qlo.dtype)
    qhi[chunk, rnd, sub, lane] = w_of.astype(qhi.dtype)
    src[chunk, rnd, pos % TILE] = (sub * LANES + lane).astype(np.int32)

    s1, s2, s3 = route_tiles(src.reshape(C * R, LANES, LANES),
                             dedupe=False)
    s3 = s3.copy()
    s3.reshape(C * R, TILE)[...] |= (
        (src.reshape(C * R, TILE) >= 0).astype(np.uint8) << 7)

    # per-(chunk, round) distinct window lists (live slots only). The
    # kernel's sweep is a STATIC k_max-unrolled loop (a dynamic-trip
    # fori_loop measured ~8x slower per page); short lists pad by
    # REPEATING their last page — re-selecting the same window is an
    # idempotent overwrite, never a double-apply.
    pages_l = []
    for c in range(C):
        for r in range(R):
            u = np.unique(qhi[c, r][qhi[c, r] >= 0])
            pages_l.append(u.astype(np.int32))
    k_max = max(max((p.size for p in pages_l), default=1), 1)
    pages = np.zeros((C * R, k_max), np.int32)
    pcnt = np.zeros((C * R,), np.int32)
    for i, p in enumerate(pages_l):
        pages[i, :p.size] = p
        if p.size:
            pages[i, p.size:] = p[-1]
        pcnt[i] = p.size
    # per-chunk window bitmap (any round): the kernel's static sweep
    # gates each window on its bit at scalar cost
    n_words = -(-n_w // 32)
    pmask = np.zeros((C, n_words), np.int64)
    for c in range(C):
        touched = np.unique(qhi[c][qhi[c] >= 0])
        np.bitwise_or.at(pmask[c], touched // 32,
                         np.int64(1) << (touched % 32))
    # bit 31 must survive the int32 prefetch array: wrap, don't clip
    pmask = pmask.astype(np.uint32).view(np.int32)

    return PagedGatherPlan(
        n=n, n_chunks=C, rounds=R, k_max=k_max, n_w=n_w,
        qlo=jnp.asarray(qlo.reshape(-1, LANES)),
        qhi=jnp.asarray(qhi.reshape(-1, LANES)),
        s1=jnp.asarray(s1.reshape(-1, LANES)),
        s2=jnp.asarray(s2.reshape(-1, LANES)),
        s3=jnp.asarray(s3.reshape(-1, LANES)),
        pages=jnp.asarray(pages),
        pcnt=jnp.asarray(pcnt),
        pmask=jnp.asarray(pmask),
    )


PAGES_PER_STEP = 32  # windows swept per inner grid step; the kernel
# body unrolls exactly this many page gathers, so Mosaic compile time
# is constant in the table size (a 64-page unrolled body took >45 min
# to compile through the tunnel)


def _pgather_kernel(R: int, n_w: int, n_wsteps: int):
    from spmv_tpu.kernels.pallas_utils import route3_batched

    def kernel(pmask_ref, qlo_ref, qhi_ref, s1_ref, s2_ref,
               s3_ref, x_ref, out_ref, acc_ref):
        t = pl.program_id(0)
        w = pl.program_id(1)

        @pl.when(w == 0)
        def _init():
            acc_ref[...] = jnp.zeros((R * LANES, LANES), x_ref.dtype)

        # sweep this step's PAGES_PER_STEP windows (STATIC sublane
        # slices of the step's (32*128, 128) table block — the x table
        # keeps the stream pipeline's transposed-window layout, built
        # by the cheap per-(128,128)-tile swapaxes; a (N,128,128) ->
        # (128,N,128) lanes-major relayout here measured ~7 ms in
        # XLA); a whole step skips at scalar cost when its bitmap
        # word is clear
        word = pmask_ref[t, w]

        @pl.when(word != 0)
        def _sweep():
            qlo = qlo_ref[...].astype(jnp.int32)   # (R*128, 128)
            qhi = qhi_ref[...].astype(jnp.int32)
            for kk in range(PAGES_PER_STEP):
                xt = x_ref[kk * LANES:(kk + 1) * LANES, :]
                for r in range(R):
                    sl = pl.ds(r * LANES, LANES)
                    g = jnp.take_along_axis(
                        xt, qlo[r * LANES:(r + 1) * LANES, :], axis=1)
                    acc_ref[sl, :] = jnp.where(
                        qhi[r * LANES:(r + 1) * LANES, :]
                        == w * PAGES_PER_STEP + kk,
                        g, acc_ref[sl, :])

        @pl.when(w == n_wsteps - 1)
        def _emit():
            out = jnp.zeros((LANES, LANES), x_ref.dtype)
            for r in range(R):
                sl = pl.ds(r * LANES, LANES)
                s3v = s3_ref[sl, :].astype(jnp.int32)
                routed = route3_batched(
                    acc_ref[sl, :], s1_ref[sl, :], s2_ref[sl, :],
                    s3v & 127)
                out = jnp.where(s3v >> 7 > 0, routed, out)
            out_ref[...] = out

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "C", "R", "n_w", "interpret"))
def _pgather_pass(x2d, qlo, qhi, s1, s2, s3, pmask, *,
                  C, R, n_w, interpret):
    n_wsteps = -(-n_w // PAGES_PER_STEP)
    blk = pl.BlockSpec((R * LANES, LANES), lambda t, w, *_: (t, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C, n_wsteps),
        in_specs=(
            [blk] * 5
            + [pl.BlockSpec((PAGES_PER_STEP * LANES, LANES),
                            lambda t, w, *_: (w, 0))]
        ),
        out_specs=pl.BlockSpec((LANES, LANES), lambda t, w, *_: (t, 0)),
        scratch_shapes=[pltpu.VMEM((R * LANES, LANES), x2d.dtype)],
    )
    return pl.pallas_call(
        _pgather_kernel(R, n_w, n_wsteps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C * LANES, LANES), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(pmask, qlo, qhi, s1, s2, s3, x2d)


def paged_gather(x, plan: PagedGatherPlan):
    """x[idx] for the planned stream; dead slots yield 0.

    Returns a flat (n,) array in the original stream order.
    """
    x = jnp.asarray(x)
    W = LANES * LANES
    n_w_pad = -(-plan.n_w // PAGES_PER_STEP) * PAGES_PER_STEP
    xp = jnp.pad(x, (0, n_w_pad * W - x.shape[0]))
    # x2d[w*128 + s, q] = x[w*16384 + q*128 + s]: the stream
    # pipeline's transposed-window layout — one cheap per-tile
    # swapaxes; the kernel's page select is a STATIC sublane slice of
    # the per-step 32-window block (a dynamic slice measured ~7x
    # slower per page, and a lanes-major relayout ~7 ms in XLA)
    x2d = jnp.swapaxes(
        xp.reshape(-1, LANES, LANES), 1, 2).reshape(-1, LANES)
    out = _pgather_pass(
        x2d, plan.qlo, plan.qhi, plan.s1, plan.s2, plan.s3,
        plan.pmask,
        C=plan.n_chunks, R=plan.rounds,
        n_w=plan.n_w, interpret=config.use_interpret())
    return out.reshape(-1)[: plan.n]
