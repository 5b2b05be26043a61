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
from spmv_tpu.ops.registry import plan_cache
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
    return CSR(A.n_rows * LANES, A.n_cols * LANES,
               Ap2.astype(np.int64), Aj2.astype(np.int32),
               Ax2.astype(Ax.dtype))


def spmm_stream(A: CSR, X, semiring: Semiring = PLUS_TIMES) -> jax.Array:
    """Y = A @ X via the stream kernel on the Kronecker expansion."""
    X = jnp.asarray(X)
    if X.ndim != 2 or X.shape[0] != A.n_cols:
        raise ValueError(f"X must be (n_cols, B); got {X.shape}")
    B = X.shape[1]
    Bp = -(-B // LANES) * LANES
    Ak: CSR = plan_cache(A, "spmm_kron", lambda: _kron_expand(A))
    if Ak.nnz > 64_000_000:
        raise ValueError("matrix too large for the stream SpMM path")
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
    xg = jnp.take(X, plan["Aj"], axis=0)
    prod = semiring.combine(plan["Ax"][:, None], xg)
    if semiring.name == "plus_times":
        y = jax.ops.segment_sum(prod, plan["rows"],
                                num_segments=A.n_rows,
                                indices_are_sorted=True)
    elif semiring.name == "min_plus":
        y = jax.ops.segment_min(prod, plan["rows"],
                                num_segments=A.n_rows,
                                indices_are_sorted=True)
    else:
        y = jax.ops.segment_max(prod, plan["rows"],
                                num_segments=A.n_rows,
                                indices_are_sorted=True)
    ident = semiring.identity_for(y.dtype)
    return semiring.reduce(y, jnp.full_like(y, ident))


def spmm(A: CSR, X, semiring: Semiring = PLUS_TIMES,
         method: str = "auto") -> jax.Array:
    """Y = A @ X (dense X of shape (n_cols, B)).

    method: 'stream' (Pallas pipeline over the Kronecker expansion),
    'xla', or 'auto' (stream when the planner can reach the matrix,
    else xla)."""
    if method == "xla":
        return spmm_xla(A, X, semiring)
    if method == "stream":
        return spmm_stream(A, X, semiring)
    try:
        return spmm_stream(A, X, semiring)
    except ValueError:
        return spmm_xla(A, X, semiring)
