"""SpMM: Y = A @ X for CSR A and dense X (n_cols, B) — TPU-native.

This is SURVEY §7 step-5 territory (beyond the reference, which is
SpMV-only). The TPU path reuses the flagship stream-SpMV kernel
unchanged via a Kronecker identity:

    A @ X  ==  unflatten( (A ⊗ I_128) @ vec(X_block) )

Expanding A by I_128 is pure plan-side index arithmetic (each nonzero
(r, j, v) becomes 128 nonzeros (128r+c, 128j+c, v)); the expanded
matrix column-sorts into naturally aligned x-windows (the 128 children
of column j ARE X's row j), so the stream pipeline's gather, shuffle
and scan apply at full element granularity — no new kernels, and the
per-matrix expanded plan is cached and shared by every 128-column
block of X and every call.

Above the stream planner's reach (~60M expanded nonzeros, i.e. ~450K
nnz per 128-column block), `spmm` falls back to an XLA row-gather +
segment-reduction path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.kernels.stream import _stream_spmv, DEFAULT_POLICY
from spmv_tpu.ops.registry import plan_cache, PlanCapacityError
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES

LANES = 128


def _kron_expand(A: CSR) -> CSR:
    """A ⊗ I_128 as CSR (row-major by construction)."""
    Ap = np.asarray(A.Ap, dtype=np.int64)
    Aj = np.asarray(A.Aj, dtype=np.int64)
    Ax = np.asarray(A.Ax)
    nnz = int(Ap[-1])
    lens = (Ap[1:] - Ap[:-1]).astype(np.int64)
    # expanded row (128r+c) holds row r's nonzeros at columns 128j+c:
    # order rows (r, c), within each the original column order.
    # index of source nnz for expanded position: for row r, block of
    # 128*len(r) entries laid out c-major.
    reps = np.repeat(lens, LANES)  # per (r, c) expanded-row length
    Ap2 = np.concatenate([[0], np.cumsum(reps)])
    starts = np.repeat(Ap[:-1], LANES)  # source-row start per (r, c)
    offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        Ap2[:-1], reps)
    src = np.repeat(starts, reps) + offs  # source nnz per entry
    c_of = np.repeat(np.tile(np.arange(LANES, dtype=np.int64), A.n_rows),
                     reps)
    Aj2 = Aj[src] * LANES + c_of
    Ax2 = Ax[src]
    # expanded columns reach n_cols*128: keep int64 when int32 would wrap
    idx_dtype = (np.int32 if A.n_cols * LANES <= np.iinfo(np.int32).max
                 else np.int64)
    return CSR(A.n_rows * LANES, A.n_cols * LANES,
               Ap2.astype(np.int64), Aj2.astype(idx_dtype),
               Ax2.astype(Ax.dtype))


def spmm_stream(A: CSR, X, semiring: Semiring = PLUS_TIMES) -> jax.Array:
    """Y = A @ X via the stream kernel on the Kronecker expansion."""
    X = jnp.asarray(X)
    if X.ndim != 2 or X.shape[0] != A.n_cols:
        raise ValueError(f"X must be (n_cols, B); got {X.shape}")
    B = X.shape[1]
    Bp = -(-B // LANES) * LANES
    # capacity check BEFORE building/caching the 128x expansion — a
    # matrix moderately over the cap must fall back cleanly, not OOM
    # allocating tens of GB of expanded plan first
    if A.nnz * LANES > 64_000_000:
        raise PlanCapacityError(
            "matrix too large for the stream SpMM path")
    Ak: CSR = plan_cache(A, "spmm_kron", lambda: _kron_expand(A))
    Xp = jnp.pad(X, ((0, 0), (0, Bp - B)))
    outs = []
    for vb in range(Bp // LANES):
        xv = Xp[:, vb * LANES:(vb + 1) * LANES].reshape(-1)
        yv = _stream_spmv(Ak, xv, semiring, DEFAULT_POLICY)
        outs.append(yv.reshape(A.n_rows, LANES))
    return jnp.concatenate(outs, axis=1)[:, :B]


def spmm_xla(A: CSR, X, semiring: Semiring = PLUS_TIMES) -> jax.Array:
    """XLA fallback: row gather + sorted segment reduction."""
    X = jnp.asarray(X)
    plan = plan_cache(A, "spmm_xla", lambda: {
        "rows": jnp.asarray(A.row_ids()),
        "Aj": jnp.asarray(np.asarray(A.Aj)),
        "Ax": jnp.asarray(np.asarray(A.Ax)),
    })
    from spmv_tpu.ops.semiring import segment_reduce_sorted

    xg = jnp.take(X, plan["Aj"], axis=0)
    prod = semiring.combine(plan["Ax"][:, None], xg)
    ident = float(semiring.identity_for(prod.dtype))
    return segment_reduce_sorted(prod, plan["rows"], A.n_rows, semiring,
                                 ident)


def spmm(A: CSR, X, semiring: Semiring = PLUS_TIMES,
         method: str = "auto") -> jax.Array:
    """Y = A @ X (dense X of shape (n_cols, B)).

    method: 'stream' (Pallas pipeline over the Kronecker expansion),
    'xla', or 'auto' (stream when the planner can reach the matrix,
    else xla)."""
    X = jnp.asarray(X)
    # validate once here so the auto fallback below only ever fires on
    # planner-capacity errors, never on user shape mistakes (which
    # spmm_xla would silently clamp-gather into plausible garbage)
    if X.ndim != 2 or X.shape[0] != A.n_cols:
        raise ValueError(f"X must be (n_cols, B) = ({A.n_cols}, B); "
                         f"got {X.shape}")
    if method == "xla":
        return spmm_xla(A, X, semiring)
    if method == "stream":
        return spmm_stream(A, X, semiring)
    try:
        return spmm_stream(A, X, semiring)
    except PlanCapacityError:
        return spmm_xla(A, X, semiring)
