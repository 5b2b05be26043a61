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


@functools.partial(jax.jit, static_argnames=("n_rows", "sr_name"))
def _xla_spmv(rows, Aj, Ax, x, n_rows: int, sr_name: str):
    x_gather = jnp.take(x, Aj)
    if sr_name == "plus_times":
        prod = Ax * x_gather
        return jax.ops.segment_sum(
            prod, rows, num_segments=n_rows, indices_are_sorted=True
        )
    from spmv_tpu.ops.semiring import BUILTIN_SEMIRINGS

    sr = BUILTIN_SEMIRINGS[sr_name]
    prod = sr.combine(Ax, x_gather)
    if sr_name == "min_plus":
        return jax.ops.segment_min(
            prod, rows, num_segments=n_rows, indices_are_sorted=True
        )
    # max_times / or_and both reduce with max.
    return jax.ops.segment_max(
        prod, rows, num_segments=n_rows, indices_are_sorted=True
    )


@register("xla", supports_semiring=True, reference_analog="cusparse.cuh:36-89",
          aliases=("cusparse",))
def _xla(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Vendor baseline: XLA gather + sorted segment reduction."""
    plan = plan_cache(A, "xla", lambda: {
        "rows": jnp.asarray(A.row_ids()),
        "Aj": jnp.asarray(np.asarray(A.Aj)),
        "Ax": jnp.asarray(np.asarray(A.Ax)),
    })
    from spmv_tpu.ops.semiring import BUILTIN_SEMIRINGS

    if semiring.name not in BUILTIN_SEMIRINGS:
        # Generic semirings: unfused reduce via reduce_array over padded
        # rows would be wasteful here; defer to merge_genl for those.
        raise ValueError("kind 'xla' supports built-in semirings only")
    y = _xla_spmv(plan["rows"], plan["Aj"], plan["Ax"], jnp.asarray(x),
                  n_rows=A.n_rows, sr_name=semiring.name)
    if semiring.name != "plus_times":
        # Identity participates in every row reduction (oracle
        # semantics, ref: cpu_navie.hpp:20-35); this also fixes empty
        # rows, which segment_min/max fill with ±inf.
        ident = float(semiring.identity_for(y.dtype))
        y = semiring.reduce(y, jnp.full_like(y, ident))
    return y


@register("dense", reference_analog="(none; sanity baseline)")
def _dense(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """Densify + MXU matvec — sanity baseline for small matrices only."""
    if semiring is not PLUS_TIMES:
        raise ValueError("kind 'dense' supports plus_times only")
    if A.n_rows * A.n_cols > 64 * 1024 * 1024:
        raise ValueError("matrix too large to densify")
    d = plan_cache(A, "dense", lambda: jnp.asarray(A.to_dense()))
    return d @ jnp.asarray(x)
