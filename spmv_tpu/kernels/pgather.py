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

# Resident-table budget: same class as stream.X_VMEM_MAX_BYTES but a
# little lower — this kernel also holds R rounds of 5 streams per step.
TABLE_VMEM_MAX_BYTES = 6 << 20
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
    qhi: jax.Array        # (C*R*128, 128) uint8/int32 window id
    s1: jax.Array         # (C*R*128, 128) uint8 route stages
    s2: jax.Array
    s3: jax.Array         # bit 7 = original-position liveness
    pages: jax.Array      # (C*R, k_max) int32 window ids to sweep
    pcnt: jax.Array       # (C*R,) int32 live pages per (chunk, round)


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
    if n_w * W * val_bytes > TABLE_VMEM_MAX_BYTES:
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

    # per-(chunk, round) distinct window lists (live slots only)
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
        pcnt[i] = p.size

    return PagedGatherPlan(
        n=n, n_chunks=C, rounds=R, k_max=k_max, n_w=n_w,
        qlo=jnp.asarray(qlo.reshape(-1, LANES)),
        qhi=jnp.asarray(qhi.reshape(-1, LANES)),
        s1=jnp.asarray(s1.reshape(-1, LANES)),
        s2=jnp.asarray(s2.reshape(-1, LANES)),
        s3=jnp.asarray(s3.reshape(-1, LANES)),
        pages=jnp.asarray(pages),
        pcnt=jnp.asarray(pcnt),
    )


def _pgather_kernel(R: int):
    from spmv_tpu.kernels.pallas_utils import route3_batched

    def kernel(pages_ref, pcnt_ref, qlo_ref, qhi_ref, s1_ref, s2_ref,
               s3_ref, x_ref, out_ref):
        t = pl.program_id(0)
        out = jnp.zeros((LANES, LANES), x_ref.dtype)
        for r in range(R):
            sl = pl.ds(r * LANES, LANES)
            qlo = qlo_ref[sl, :].astype(jnp.int32)
            qhi = qhi_ref[sl, :].astype(jnp.int32)
            s3v = s3_ref[sl, :].astype(jnp.int32)

            # dynamic-trip sweep over this round's window list
            def sweep(k, acc):
                p = pages_ref[(t * R + r), k]
                xt = x_ref[pl.ds(pl.multiple_of(p * LANES, LANES),
                                 LANES), :]
                g = jnp.take_along_axis(xt, qlo, axis=1)
                return jnp.where(qhi == p, g, acc)

            acc = jax.lax.fori_loop(
                0, pcnt_ref[t * R + r], sweep,
                jnp.zeros((LANES, LANES), x_ref.dtype))
            routed = route3_batched(acc, s1_ref[sl, :], s2_ref[sl, :],
                                    s3v & 127)
            out = jnp.where(s3v >> 7 > 0, routed, out)
        out_ref[...] = out

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "C", "R", "n_w", "interpret"))
def _pgather_pass(x2d, qlo, qhi, s1, s2, s3, pages, pcnt, *,
                  C, R, n_w, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=(
            [pl.BlockSpec((R * LANES, LANES), lambda t, *_: (t, 0))] * 5
            + [pl.BlockSpec((n_w * LANES, LANES), lambda t, *_: (0, 0))]
        ),
        out_specs=pl.BlockSpec((LANES, LANES), lambda t, *_: (t, 0)),
    )
    return pl.pallas_call(
        _pgather_kernel(R),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C * LANES, LANES), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pages, pcnt, qlo, qhi, s1, s2, s3, x2d)


def paged_gather(x, plan: PagedGatherPlan):
    """x[idx] for the planned stream; dead slots yield 0.

    Returns a flat (n,) array in the original stream order.
    """
    x = jnp.asarray(x)
    W = LANES * LANES
    xp = jnp.pad(x, (0, plan.n_w * W - x.shape[0]))
    x2d = jnp.swapaxes(
        xp.reshape(-1, LANES, LANES), 1, 2).reshape(-1, LANES)
    out = _pgather_pass(
        x2d, plan.qlo, plan.qhi, plan.s1, plan.s2, plan.s3,
        plan.pages, plan.pcnt,
        C=plan.n_chunks, R=plan.rounds, n_w=plan.n_w,
        interpret=config.use_interpret())
    return out.reshape(-1)[: plan.n]
