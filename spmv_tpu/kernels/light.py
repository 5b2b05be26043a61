"""LightSpMV analogs: load-balanced row scheduling, TPU-fast.

The reference's LightSpMV kernels (ref: include/spmv/LightSpMV.cuh)
achieve load balance with *dynamic* scheduling: a global atomic row
counter from which each vector/warp grabs the next row(s)
(ref: LightSpMV.cuh:128-135, 204-211), plus texture-cached x reads.
TPUs have no cross-core global atomics in the Pallas model (SURVEY §2
parallelism table); the goal — no compute unit waits on a long row —
is met at PLAN TIME by the stream pipeline's equal-nnz tile walk
(every grid step owns the same amount of work regardless of row skew),
and the texture-cache x path by the plan-routed gather pass.

What remains of LightSpMV's *scheduling granularity* axis is the tile
grain: the reference picks T ∈ {2,4,8,32} threads/row from the mean
row length (ref: LightSpMV.cuh:354-370); here the analogous knob is
nnz-per-tile (kappa), picked from the row-length distribution:

- ``light_vec``  (vector-level dynamic rows): FINE grain table — kappa
  shrinks as skew (p99/mean row length) grows, bounding the tail each
  step can hold.
- ``light_warp`` (warp-level dynamic rows): COARSE table.

The round-1 static-binning implementation (rows bucketed by length,
each bin packed at its own ELL width — strictly more adaptive than the
reference's single global T) remains available as ``light_vec_ell`` /
``light_warp_ell`` and is the fallback past the stream planner's
reach.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.ops.registry import register, plan_cache, PlanCapacityError
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES
from spmv_tpu.kernels.ell import build_ell_plan, ell_spmv

FINE_BINS = (1, 2, 4, 8, 16, 32, 64, 128)
COARSE_BINS = (8, 32, 128)

# (skew upper bound -> kappa): fine table reacts to mild skew, coarse
# only to extreme skew — the T-selection-table analog
# (ref: LightSpMV.cuh:354-370), re-aimed at the tile grain.
FINE_KAPPA = ((2.0, 14336), (8.0, 12288), (32.0, 10240), (1e30, 8192))
COARSE_KAPPA = ((8.0, 14336), (64.0, 12288), (1e30, 10240))


def _skew(A: CSR) -> float:
    lens = A.row_lengths()
    if lens.size == 0 or lens.mean() == 0:
        return 1.0
    return float(np.percentile(lens, 99) / max(lens.mean(), 1e-9))


def _kappa_for(A: CSR, table) -> int:
    s = _skew(A)
    for bound, kappa in table:
        if s <= bound:
            return kappa
    return table[-1][1]


def _bin_rows(A: CSR, widths):
    """Assign each row to the smallest width ≥ its nnz (last bin takes
    the rest, chunked). Returns [(width, sorted_row_ids), ...]."""
    lens = A.row_lengths()
    bins = []
    assigned = np.zeros(A.n_rows, dtype=bool)
    for w in widths[:-1]:
        lo = ~assigned & (lens <= w)
        rows = np.nonzero(lo)[0]
        if rows.size:
            bins.append((w, rows))
        assigned |= lo
    rows = np.nonzero(~assigned)[0]
    if rows.size:
        bins.append((widths[-1], rows))
    return bins


def _light_ell_impl(A: CSR, x, semiring: Semiring, widths, key: str):
    bins = plan_cache(A, (key, "bins"), lambda: _bin_rows(A, widths))
    if not bins:
        ident = semiring.identity_for(np.asarray(A.Ax).dtype)
        return jnp.full((A.n_rows,), jnp.asarray(ident))
    partials = []
    for w, rows in bins:
        plan = plan_cache(
            A, (key, "ell", w), lambda w=w, rows=rows: build_ell_plan(A, rows, w)
        )
        partials.append(ell_spmv(A, x, semiring, plan, "tree"))
    # Each bin's segment-reduce covers disjoint row sets; combine them.
    y = partials[0]
    if len(partials) > 1:
        if semiring.name == "plus_times":
            for p in partials[1:]:
                y = y + p
        else:
            for p in partials[1:]:
                y = semiring.reduce(y, p)
    return y


def _light_fast(A: CSR, x, semiring: Semiring, table, widths, key: str):
    from spmv_tpu.kernels.stream import StreamPolicy, _stream_spmv
    from spmv_tpu.ops.tuning import dispatch_fields

    kappa = plan_cache(A, (key, "kappa"), lambda: _kappa_for(A, table))
    try:
        return _stream_spmv(A, x, semiring,
                            StreamPolicy(kappa=kappa, **dispatch_fields()))
    except PlanCapacityError as e:
        from spmv_tpu.ops.registry import warn_fallback

        warn_fallback(key, "ELL", e)
        return _light_ell_impl(A, x, semiring, widths, key)


@register("light_vec", supports_semiring=True,
          reference_analog="LightSpMV.cuh:110-182,376-395")
def _light_vec(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Skew-adaptive SpMV, fine grain table (LightSpMV vector-dynamic
    analog: plan-time load balancing replaces the atomic row counter)."""
    return _light_fast(A, x, semiring, FINE_KAPPA, FINE_BINS, "light_vec")


@register("light_warp", supports_semiring=True,
          reference_analog="LightSpMV.cuh:184-263,397-416")
def _light_warp(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Skew-adaptive SpMV, coarse grain table (LightSpMV warp-dynamic
    analog)."""
    return _light_fast(A, x, semiring, COARSE_KAPPA, COARSE_BINS,
                       "light_warp")


@register("light_vec_ell", supports_semiring=True,
          reference_analog="LightSpMV.cuh:110-182 (static-binned ELL)")
def _light_vec_ell(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Binned-row ELL SpMV, fine bins: rows bucketed by length, each
    bin packed at its own width (per-bin T — strictly more adaptive
    than the reference's single global T); the reach fallback."""
    return _light_ell_impl(A, x, semiring, FINE_BINS, "light_vec")


@register("light_warp_ell", supports_semiring=True,
          reference_analog="LightSpMV.cuh:184-263 (static-binned ELL)")
def _light_warp_ell(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Binned-row ELL SpMV, coarse bins; the reach fallback."""
    return _light_ell_impl(A, x, semiring, COARSE_BINS, "light_warp")
