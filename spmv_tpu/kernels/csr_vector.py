"""csr-vector SpMV family: the CUSP kernel analogs.

Reference kinds "cusp"/"cusp1"/"cusp2"
(ref: include/spmv/cusp/cusp.cuh, cusp_warp_reduce.cuh,
cusp_warp_read_reduce.cuh): T threads cooperate per row, T chosen from
mean nnz/row, differing in reduction strategy (shared-memory tree vs
warp shuffle) and offset delivery (shared memory vs shuffle
broadcast).

TPU translation: W lanes per row chunk over packed ELL tiles (see
kernels/ell.py), with the same three strategy variants:

- ``csr_vector``       — linear roll-accumulate ("smem tree" analog)
- ``csr_vector_shfl``  — log-step roll tree ("warp shuffle" analog);
  like the reference dispatcher, it falls back to the linear kernel
  for W ≤ 16 (ref: cusp_warp_reduce.cuh:100-127 only shuffles at T=32)
- ``csr_vector_shfl2`` — tree reduce + roll-broadcast of the result
  within the group ("offsets read via shuffle" analog,
  ref: cusp_warp_read_reduce.cuh:27-34), same W ≤ 16 fallback

plus ``csr_scalar``, the simple row-parallel kernel at full 128-lane
width (the Pallas starter kernel; oracle-adjacent).
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.ops.registry import register, plan_cache
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES
from spmv_tpu.kernels.ell import build_ell_plan, ell_spmv, select_width


def _all_rows(A: CSR) -> np.ndarray:
    return np.arange(A.n_rows, dtype=np.int64)


def _csr_vector_impl(A: CSR, x, semiring: Semiring, strategy: str, min_shfl_width: int = 0):
    W = select_width(A.mean_nnz_per_row)
    if W <= min_shfl_width:
        # Reference parity: the shuffle dispatchers fall back to the
        # original (linear) kernel for narrow rows
        # (ref: cusp_warp_reduce.cuh:100-127).
        strategy = "linear"
    plan = plan_cache(A, ("ell", W), lambda: build_ell_plan(A, _all_rows(A), W))
    return ell_spmv(A, x, semiring, plan, strategy)


@register("csr_vector", supports_semiring=True,
          reference_analog="cusp/cusp.cuh:19-237", aliases=("cusp",))
def _csr_vector(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """csr-vector, linear group accumulate (cusp smem-tree analog)."""
    return _csr_vector_impl(A, x, semiring, "linear")


@register("csr_vector_shfl", supports_semiring=True,
          reference_analog="cusp/cusp_warp_reduce.cuh:11-148", aliases=("cusp1",))
def _csr_vector_shfl(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """csr-vector, log-step tree reduce (cusp1 warp-shuffle analog)."""
    return _csr_vector_impl(A, x, semiring, "tree", min_shfl_width=16)


@register("csr_vector_shfl2", supports_semiring=True,
          reference_analog="cusp/cusp_warp_read_reduce.cuh:11-154", aliases=("cusp2",))
def _csr_vector_shfl2(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """csr-vector, tree reduce + group broadcast (cusp2 analog)."""
    return _csr_vector_impl(A, x, semiring, "broadcast", min_shfl_width=16)


@register("csr_scalar", supports_semiring=True,
          reference_analog="(SURVEY §7.3a; row-parallel baseline)")
def _csr_scalar(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Row-parallel Pallas kernel: each row chunked at full 128-lane width."""
    plan = plan_cache(A, ("ell", 128), lambda: build_ell_plan(A, _all_rows(A), 128))
    return ell_spmv(A, x, semiring, plan, "tree")
