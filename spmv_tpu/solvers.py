"""Iterative Krylov solvers on top of the SpMV kernel zoo.

The reference is a kernel benchmark and stops at y = A @ x; a
standalone sparse library must also *use* its kernels. This module
supplies the two standard Krylov methods (CG for SPD systems,
BiCGSTAB for general square systems) as jit-compiled
`lax.while_loop`s — every iteration is one or two SpMV dispatches
through the registry (any registered kind) plus vector work XLA fuses
into a handful of HBM passes, with optional Jacobi or ILU(0)
preconditioning (kernels/trisolve.py).

TPU notes: the loop carries only O(n) vectors; convergence tests ride
in the carry (no host sync per iteration); the one host decision —
total iteration count — is `maxiter`, a static bound. Callers read
`info["iters"]`/`info["resnorm"]` afterwards (one device fetch).
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.kernels.trisolve import ilu0, ilu0_apply
from spmv_tpu.ops.registry import spmv


def _matvec(A: CSR, kind: str) -> Callable:
    return lambda v: spmv(kind, A, v)


def _preconditioner(A: CSR, M) -> Callable:
    """None | 'jacobi' | 'ilu0' | callable -> apply function."""
    if M is None:
        return lambda r: r
    if callable(M):
        return M
    if M == "jacobi":
        Ap = np.asarray(A.Ap, np.int64)
        Aj = np.asarray(A.Aj, np.int64)
        Ax = np.asarray(A.Ax)
        rows = np.repeat(np.arange(A.n_rows, dtype=np.int64),
                         Ap[1:] - Ap[:-1])
        d = np.zeros(A.n_rows, dtype=Ax.dtype)
        on_diag = rows == Aj
        d[rows[on_diag]] = Ax[on_diag]
        if (d == 0).any():
            raise ValueError("jacobi preconditioner: zero diagonal entry")
        dinv = jnp.asarray(1.0 / d)
        return lambda r: dinv * r
    if M == "ilu0":
        L, U = ilu0(A)
        return lambda r: ilu0_apply(L, U, r)
    raise ValueError(f"unknown preconditioner {M!r}; use None, 'jacobi', "
                     f"'ilu0', or a callable")


def cg(A: CSR, b, *, x0=None, rtol: float = 1e-6, atol: float = 0.0,
       maxiter: Optional[int] = None, M=None,
       kind: str = "xla"):
    """Conjugate gradients for SPD A. Returns (x, info) with
    info = {"iters", "resnorm", "converged"}.

    Matches scipy.sparse.linalg.cg semantics: stop when
    ||r|| <= max(rtol*||b||, atol). `kind` picks the SpMV kernel
    (any registered kind; "stream" for large matrices on TPU).
    """
    if A.n_rows != A.n_cols:
        raise ValueError("cg requires a square matrix")
    b = jnp.asarray(b)
    if b.shape != (A.n_rows,):
        raise ValueError(f"b has shape {b.shape}, expected ({A.n_rows},)")
    mv = _matvec(A, kind)
    psolve = _preconditioner(A, M)
    n = A.n_rows
    if maxiter is None:
        maxiter = min(10 * n, 10_000)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    target = jnp.maximum(rtol * jnp.linalg.norm(b), atol)

    r = b - mv(x)
    z = psolve(r)
    p = z
    rz = jnp.vdot(r, z)

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.linalg.norm(r) > target) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k = state
        Ap_ = mv(p)
        denom = jnp.vdot(p, Ap_)
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap_
        z = psolve(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = jax.lax.while_loop(cond, body, (x, r, z, p, rz, 0))
    resnorm = jnp.linalg.norm(r)
    return x, {"iters": int(k), "resnorm": float(resnorm),
               "converged": bool(resnorm <= target)}


def bicgstab(A: CSR, b, *, x0=None, rtol: float = 1e-6, atol: float = 0.0,
             maxiter: Optional[int] = None, M=None,
             kind: str = "xla"):
    """BiCGSTAB for general square A. Returns (x, info) like `cg`."""
    if A.n_rows != A.n_cols:
        raise ValueError("bicgstab requires a square matrix")
    b = jnp.asarray(b)
    if b.shape != (A.n_rows,):
        raise ValueError(f"b has shape {b.shape}, expected ({A.n_rows},)")
    mv = _matvec(A, kind)
    psolve = _preconditioner(A, M)
    n = A.n_rows
    if maxiter is None:
        maxiter = min(10 * n, 10_000)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)

    target = jnp.maximum(rtol * jnp.linalg.norm(b), atol)

    r = b - mv(x)
    rhat = r  # shadow residual, fixed
    rho = jnp.vdot(rhat, r)
    p = r

    def cond(state):
        x, r, p, rho, k, brk = state
        return (jnp.linalg.norm(r) > target) & (k < maxiter) & ~brk

    def body(state):
        x, r, p, rho, k, brk = state
        ph = psolve(p)
        v = mv(ph)
        denom = jnp.vdot(rhat, v)
        alpha = jnp.where(denom != 0, rho / denom, 0.0)
        s = r - alpha * v
        sh = psolve(s)
        t = mv(sh)
        tt = jnp.vdot(t, t)
        omega = jnp.where(tt != 0, jnp.vdot(t, s) / tt, 0.0)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        rho_new = jnp.vdot(rhat, r)
        beta = jnp.where((rho != 0) & (omega != 0),
                         (rho_new / rho) * (alpha / omega), 0.0)
        p = r + beta * (p - omega * v)
        # breakdown: rho or omega vanished — r no longer improvable
        brk = (rho_new == 0) | (omega == 0)
        return (x, r, p, rho_new, k + 1, brk)

    x, r, _, _, k, _ = jax.lax.while_loop(
        cond, body, (x, r, p, rho, 0, jnp.asarray(False)))
    resnorm = jnp.linalg.norm(r)
    return x, {"iters": int(k), "resnorm": float(resnorm),
               "converged": bool(resnorm <= target)}
