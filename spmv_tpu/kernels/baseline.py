"""Baseline SpMV kinds: CPU oracle, XLA vendor-op analog, dense.

``xla`` is this framework's analog of the reference's vendor-library
baseline (cuSPARSE wrapper, ref: include/spmv/cusparse.cuh:36-89): the
"whatever the platform vendor gives you" path — here, XLA's native
gather + sorted-segment scatter-add, fully fused by the compiler.

``cpu_naive`` mirrors the oracle kind (ref: include/spmv/cpu_navie.hpp)
so the harness can time it like any other kind.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.ops.registry import register, plan_cache
from spmv_tpu.ops.reference import spmv_ref, spmv_ref_semiring
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES


@register("cpu_naive", supports_semiring=True, reference_analog="cpu_navie.hpp:3-35",
          aliases=("cpu_navie",))
def _cpu_naive(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Host NumPy row-loop oracle (ref: cpu_navie.hpp:3-35)."""
    if semiring is PLUS_TIMES:
        return jnp.asarray(spmv_ref(A, np.asarray(x)))
    return jnp.asarray(spmv_ref_semiring(A, np.asarray(x), semiring))


# `sr` is static: user-defined semirings trace straight in (functor_t
# analog, ref: merge_genl/agent_spmv_orig.cuh:98-124).
@functools.partial(jax.jit, static_argnames=("n_rows", "sr"))
def _xla_spmv(rows, Aj, Ax, x, n_rows: int, sr: Semiring):
    from spmv_tpu.ops.semiring import segment_reduce_sorted

    x_gather = jnp.take(x, Aj)
    prod = sr.combine(Ax, x_gather)
    ident = float(sr.identity_for(prod.dtype))
    return segment_reduce_sorted(prod, rows, n_rows, sr, ident)


@register("xla", supports_semiring=True, reference_analog="cusparse.cuh:36-89",
          aliases=("cusparse",))
def _xla(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Vendor baseline: XLA gather + sorted segment reduction."""
    plan = plan_cache(A, "xla", lambda: {
        "rows": jnp.asarray(A.row_ids()),
        "Aj": jnp.asarray(np.asarray(A.Aj)),
        "Ax": jnp.asarray(np.asarray(A.Ax)),
    })
    return _xla_spmv(plan["rows"], plan["Aj"], plan["Ax"], jnp.asarray(x),
                     n_rows=A.n_rows, sr=semiring)


@register("dense", reference_analog="(none; sanity baseline)")
def _dense(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Densify + MXU matvec — sanity baseline for small matrices only."""
    if semiring is not PLUS_TIMES:
        raise ValueError("kind 'dense' supports plus_times only")
    if A.n_rows * A.n_cols > 64 * 1024 * 1024:
        raise ValueError("matrix too large to densify")
    d = plan_cache(A, "dense", lambda: jnp.asarray(A.to_dense()))
    return d @ jnp.asarray(x)
