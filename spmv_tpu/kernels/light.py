"""LightSpMV analogs: load-balanced row scheduling by length binning.

The reference's LightSpMV kernels (ref: include/spmv/LightSpMV.cuh)
achieve load balance with *dynamic* scheduling: a global atomic row
counter from which each vector/warp grabs the next row(s)
(ref: LightSpMV.cuh:128-135, 204-211), plus texture-cached x reads.
TPUs have no cross-core global atomics in the Pallas model (SURVEY §2
parallelism table), so the TPU-native equivalent of "no warp waits on
a long row" is **static binning**: rows are bucketed by nnz at plan
time and each bucket is packed and executed at a lane width that fits
its rows — short rows share a vector register, long rows span chunks.
Same goal (tail-latency control under skew), mechanism moved from
runtime atomics to plan-time scheduling.

Two kinds mirror the reference's two granularities:

- ``light_vec``  (ref: LightSpMV.cuh:110-182, vector-level dynamic
  rows): fine power-of-two bins {1,2,4,...,128}.
- ``light_warp`` (ref: LightSpMV.cuh:184-263, warp-level dynamic
  rows): coarse bins {8, 32, 128}.

The per-bin width table plays the role of the reference's
mean-nnz/row T selection (ref: LightSpMV.cuh:354-370) — but per bin
rather than per matrix, which is strictly more adaptive.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.ops.registry import register, plan_cache
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES
from spmv_tpu.kernels.ell import build_ell_plan, ell_spmv

FINE_BINS = (1, 2, 4, 8, 16, 32, 64, 128)
COARSE_BINS = (8, 32, 128)


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


def _light_impl(A: CSR, x, semiring: Semiring, widths, key: str):
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
    # For plus_times absent rows contribute 0, so a sum works; for
    # min/max semirings absent rows yield the reduction's neutral fill
    # (+inf/-inf), which we replace with the semiring identity.
    y = partials[0]
    if len(partials) > 1:
        if semiring.name == "plus_times":
            for p in partials[1:]:
                y = y + p
        else:
            for p in partials[1:]:
                y = semiring.reduce(y, p)
    return y


@register("light_vec", supports_semiring=True,
          reference_analog="LightSpMV.cuh:110-182,376-395")
def _light_vec(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Binned-row SpMV, fine bins (LightSpMV vector-dynamic analog)."""
    return _light_impl(A, x, semiring, FINE_BINS, "light_vec")


@register("light_warp", supports_semiring=True,
          reference_analog="LightSpMV.cuh:184-263,397-416")
def _light_warp(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Binned-row SpMV, coarse bins (LightSpMV warp-dynamic analog)."""
    return _light_impl(A, x, semiring, COARSE_BINS, "light_warp")
