"""Triangular solve + ILU(0) tests (north star, SURVEY §7.5).

sptrsv vs scipy.sparse.linalg.spsolve_triangular; ilu0's defining
property ((L@U) == A on A's pattern) on SPD matrices, plus the
preconditioner-apply path.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from spmv_tpu import ilu0, ilu0_apply, sptrsv
from spmv_tpu.formats import COO, CSR, coo_to_csr, csr_from_dense


def _to_scipy(A):
    return sp.csr_matrix(
        (np.asarray(A.Ax), np.asarray(A.Aj), np.asarray(A.Ap)),
        shape=A.shape)


def _rand_lower(n, density, seed, unit=False):
    rng = np.random.default_rng(seed)
    d = np.tril(rng.random((n, n)) < density, k=-1).astype(np.float64)
    vals = rng.standard_normal((n, n)) * d
    np.fill_diagonal(vals, 1.0 if unit else rng.random(n) + 1.0)
    if unit:
        np.fill_diagonal(vals, 1.0)
    return csr_from_dense(vals.astype(np.float32))


@pytest.mark.parametrize("n,density", [(80, 0.1), (200, 0.03)])
def test_sptrsv_lower(n, density):
    L = _rand_lower(n, density, seed=n)
    b = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    x = np.asarray(sptrsv(L, b, lower=True))
    x_ref = spla.spsolve_triangular(
        _to_scipy(L).astype(np.float64), b.astype(np.float64), lower=True)
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_sptrsv_upper():
    n = 120
    L = _rand_lower(n, 0.05, seed=3)
    d = _to_scipy(L).toarray().T  # upper triangular
    U = csr_from_dense(d.astype(np.float32))
    b = np.random.default_rng(2).standard_normal(n).astype(np.float32)
    x = np.asarray(sptrsv(U, b, lower=False))
    x_ref = spla.spsolve_triangular(
        sp.csr_matrix(d.astype(np.float64)), b.astype(np.float64),
        lower=False)
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_sptrsv_unit_diag():
    n = 60
    L = _rand_lower(n, 0.08, seed=5, unit=True)
    # strip the stored diagonal -> implicit unit diag
    d = _to_scipy(L).toarray()
    np.fill_diagonal(d, 0.0)
    Ls = csr_from_dense(d.astype(np.float32))
    b = np.random.default_rng(3).standard_normal(n).astype(np.float32)
    x = np.asarray(sptrsv(Ls, b, lower=True, unit_diagonal=True))
    dfull = d.copy()
    np.fill_diagonal(dfull, 1.0)
    x_ref = np.linalg.solve(dfull, b.astype(np.float64))
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_sptrsv_rejects_nontriangular():
    A = csr_from_dense(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    with pytest.raises(ValueError, match="triangular"):
        sptrsv(A, np.ones(2, np.float32))


def test_sptrsv_missing_diag_raises():
    d = np.array([[1.0, 0.0], [2.0, 0.0]], np.float32)  # row 1: no diag
    A = csr_from_dense(d)
    with pytest.raises(ValueError, match="diagonal"):
        sptrsv(A, np.ones(2, np.float32))


def _spd(n, seed):
    """Sparse SPD: B = R R^T + n I restricted to a sparse pattern."""
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < 0.06
    mask = mask | mask.T
    np.fill_diagonal(mask, True)
    M = rng.standard_normal((n, n)) * mask
    A = (M + M.T) / 2 + np.diag(np.full(n, float(n) / 3))
    A = A * mask
    return csr_from_dense(A.astype(np.float64))


def test_ilu0_defining_property():
    A = _spd(100, seed=11)
    L, U = ilu0(A)
    Ld = _to_scipy(L).toarray() + np.eye(A.n_rows)
    Ud = _to_scipy(U).toarray()
    LU = Ld @ Ud
    Ad = _to_scipy(A).toarray()
    # (L@U)[i,j] == A[i,j] wherever A stores an entry
    pat = Ad != 0
    np.testing.assert_allclose(LU[pat], Ad[pat], rtol=1e-6, atol=1e-8)
    # L strictly lower, U upper
    assert np.triu(_to_scipy(L).toarray()).sum() == 0
    assert np.tril(_to_scipy(U).toarray(), k=-1).sum() == 0


def test_ilu0_preconditioner_apply():
    A = _spd(80, seed=13)
    L, U = ilu0(A)
    r = np.random.default_rng(4).standard_normal(A.n_rows)
    z = np.asarray(ilu0_apply(L, U, r.astype(np.float32)))
    Ld = _to_scipy(L).toarray() + np.eye(A.n_rows)
    Ud = _to_scipy(U).toarray()
    z_ref = np.linalg.solve(Ud, np.linalg.solve(Ld, r))
    np.testing.assert_allclose(z, z_ref, rtol=2e-3, atol=2e-3)


def test_ilu0_improves_conditioning():
    # ILU(0)-preconditioned residual after one Richardson step beats
    # the unpreconditioned one (sanity that M^-1 ~ A^-1).
    A = _spd(60, seed=17)
    Ad = _to_scipy(A).toarray()
    L, U = ilu0(A)
    b = np.random.default_rng(5).standard_normal(A.n_rows)
    z = np.asarray(ilu0_apply(L, U, b.astype(np.float32)),
                   dtype=np.float64)
    assert (np.linalg.norm(b - Ad @ z)
            < 0.5 * np.linalg.norm(b - Ad @ (b / np.diag(Ad))))
