"""Krylov solvers (solvers.py) vs dense direct solves.

The reference has no solver layer; these tests pin the library-level
contract: cg/bicgstab converge on well-conditioned systems to the
direct solution, preconditioning reduces iteration counts, and the
breakdown/validation paths raise cleanly.
"""

import numpy as np
import pytest

from spmv_tpu.formats import COO, coo_to_csr
from spmv_tpu.solvers import bicgstab, cg


def _poisson2d(m: int):
    """Standard SPD 5-point Laplacian on an m x m grid."""
    n = m * m
    rows, cols, vals = [], [], []
    for i in range(m):
        for j in range(m):
            k = i * m + j
            rows.append(k), cols.append(k), vals.append(4.0)
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < m and 0 <= jj < m:
                    rows.append(k), cols.append(ii * m + jj)
                    vals.append(-1.0)
    return coo_to_csr(COO(n, n, np.array(rows), np.array(cols),
                          np.array(vals, np.float32)))


def _nonsym(n: int, seed=3):
    """Diagonally dominant nonsymmetric matrix (bicgstab territory).
    Duplicate (i, j) draws are removed: kernels SUM duplicates while
    ilu0's pattern map cannot represent them."""
    rng = np.random.default_rng(seed)
    nnz_off = 4 * n
    rows = rng.integers(0, n, nnz_off)
    cols = rng.integers(0, n, nnz_off)
    off = ~np.isin(rows * n + cols,
                   np.arange(n) * n + np.arange(n))
    key, uniq = np.unique(rows * n + cols, return_index=True)
    keep = uniq[off[uniq]]
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(rows.size).astype(np.float32) * 0.1
    rows = np.concatenate([rows, np.arange(n)])
    cols = np.concatenate([cols, np.arange(n)])
    vals = np.concatenate([vals, np.full(n, 5.0, np.float32)])
    return coo_to_csr(COO(n, n, rows, cols, vals))


def _dense(A):
    d = np.zeros((A.n_rows, A.n_cols), np.float64)
    Ap, Aj, Ax = (np.asarray(A.Ap), np.asarray(A.Aj),
                  np.asarray(A.Ax, np.float64))
    for r in range(A.n_rows):
        d[r, Aj[Ap[r]:Ap[r + 1]]] += Ax[Ap[r]:Ap[r + 1]]
    return d


def test_cg_poisson_matches_direct():
    A = _poisson2d(12)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.n_rows).astype(np.float32)
    x, info = cg(A, b, rtol=1e-6, maxiter=2000)
    assert info["converged"], info
    xd = np.linalg.solve(_dense(A), b.astype(np.float64))
    np.testing.assert_allclose(np.asarray(x), xd, rtol=0, atol=5e-4)


@pytest.mark.parametrize("M", ["jacobi", "ilu0"])
def test_cg_preconditioned(M):
    A = _poisson2d(10)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.n_rows).astype(np.float32)
    x0_, info0 = cg(A, b, rtol=1e-6, maxiter=2000)
    xp_, infop = cg(A, b, rtol=1e-6, maxiter=2000, M=M)
    assert infop["converged"]
    np.testing.assert_allclose(np.asarray(xp_), np.asarray(x0_), atol=5e-3)
    if M == "ilu0":  # ilu0 on the Laplacian cuts iterations hard
        assert infop["iters"] < info0["iters"]


def test_bicgstab_nonsymmetric():
    A = _nonsym(150)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(A.n_rows).astype(np.float32)
    x, info = bicgstab(A, b, rtol=1e-6, maxiter=500)
    assert info["converged"], info
    xd = np.linalg.solve(_dense(A), b.astype(np.float64))
    # fp32 BiCGSTAB's recursive residual drifts from the true one;
    # solution accuracy is what the contract promises
    np.testing.assert_allclose(np.asarray(x), xd, rtol=0, atol=5e-2)


def test_bicgstab_ilu0_fewer_iters():
    A = _nonsym(150)
    rng = np.random.default_rng(4)
    b = rng.standard_normal(A.n_rows).astype(np.float32)
    _, info0 = bicgstab(A, b, rtol=1e-6, maxiter=500)
    _, infop = bicgstab(A, b, rtol=1e-6, maxiter=500, M="ilu0")
    assert infop["converged"]
    assert infop["iters"] <= info0["iters"]


def test_solver_validation():
    A = _poisson2d(4)
    b = np.ones(A.n_rows, np.float32)
    with pytest.raises(ValueError, match="shape"):
        cg(A, b[:-1])
    with pytest.raises(ValueError, match="preconditioner"):
        cg(A, b, M="nope")
    rect = coo_to_csr(COO(3, 4, np.array([0]), np.array([1]),
                          np.array([1.0], np.float32)))
    with pytest.raises(ValueError, match="square"):
        bicgstab(rect, np.ones(3, np.float32))


def test_cg_with_x0_and_atol():
    A = _poisson2d(6)
    b = np.ones(A.n_rows, np.float32)
    x1, _ = cg(A, b, rtol=1e-6)
    # warm start at the solution: zero iterations needed
    x2, info = cg(A, b, x0=np.asarray(x1), rtol=1e-6)
    assert info["iters"] == 0


def test_gmres_nonsymmetric_matches_direct():
    from spmv_tpu.solvers import gmres

    A = _nonsym(160)
    rng = np.random.default_rng(0)
    xstar = rng.standard_normal(160).astype(np.float32)
    b = (A.to_dense() @ xstar).astype(np.float32)
    x, info = gmres(A, b, rtol=1e-5, restart=40)
    assert info["converged"]
    np.testing.assert_allclose(np.asarray(x), xstar, rtol=2e-3, atol=2e-3)


def test_gmres_restart_cycles():
    from spmv_tpu.solvers import gmres

    A = _nonsym(200, seed=9)
    b = np.ones(200, np.float32)
    # tiny restart forces multiple cycles; must still converge
    x, info = gmres(A, b, rtol=1e-5, restart=8)
    assert info["converged"]
    r = b - A.to_dense() @ np.asarray(x)
    assert np.linalg.norm(r) <= 1e-4 * np.linalg.norm(b) * 10


def test_gmres_preconditioned_fewer_iters():
    from spmv_tpu.solvers import gmres

    A = _poisson2d(14)
    b = np.ones(A.n_rows, np.float32)
    x0, i0 = gmres(A, b, rtol=1e-6, restart=20)
    x1, i1 = gmres(A, b, rtol=1e-6, restart=20, M="ilu0")
    assert i1["converged"]
    assert i1["iters"] <= i0["iters"]
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=1e-3, atol=1e-4)


def test_gmres_validation():
    from spmv_tpu.io.generate import random_csr
    from spmv_tpu.solvers import gmres

    A = random_csr(10, 12, nnz=30, seed=0)
    with pytest.raises(ValueError, match="square"):
        gmres(A, np.ones(10, np.float32))
    B = _nonsym(16)
    with pytest.raises(ValueError, match="shape"):
        gmres(B, np.ones(7, np.float32))
