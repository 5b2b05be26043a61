"""scipy.sparse / BCOO interop round-trips."""

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from spmv_tpu import spmv, spmv_ref
from spmv_tpu.io.generate import power_law_csr, random_csr
from spmv_tpu.io.interop import from_bcoo, from_scipy, to_bcoo, to_scipy


def test_scipy_roundtrip():
    A = random_csr(120, 90, nnz=800, seed=4)
    S = to_scipy(A)
    assert S.shape == (120, 90)
    B = from_scipy(S)
    # scipy sums duplicates; compare the dense views
    np.testing.assert_allclose(B.to_dense(), A.to_dense(), rtol=1e-6)


def test_from_scipy_other_formats():
    rng = np.random.default_rng(0)
    D = rng.standard_normal((40, 40)) * (rng.random((40, 40)) < 0.1)
    for make in (scipy_sparse.coo_matrix, scipy_sparse.csc_matrix,
                 scipy_sparse.csr_matrix):
        A = from_scipy(make(D.astype(np.float32)))
        np.testing.assert_allclose(A.to_dense(), D.astype(np.float32),
                                   rtol=1e-6)


def test_from_scipy_dtype_override():
    S = scipy_sparse.random(50, 50, density=0.05, format="csr",
                            random_state=1, dtype=np.float64)
    A = from_scipy(S, offset_dtype=np.int64, index_dtype=np.int64)
    assert np.asarray(A.Ap).dtype == np.int64
    assert np.asarray(A.Aj).dtype == np.int64
    assert np.asarray(A.Ax).dtype == np.float64


def test_from_scipy_rejects_dense():
    with pytest.raises(TypeError):
        from_scipy(np.eye(3))


def test_spmv_on_converted_matches_scipy():
    S = scipy_sparse.random(300, 200, density=0.03, format="csr",
                            random_state=7, dtype=np.float32)
    A = from_scipy(S)
    x = np.random.default_rng(2).standard_normal(200).astype(np.float32)
    y = spmv("xla", A, x)
    np.testing.assert_allclose(np.asarray(y), S @ x, rtol=1e-4, atol=1e-5)


def test_bcoo_roundtrip():
    A = power_law_csr(128, 128, nnz=900, alpha=1.4, seed=9)
    M = to_bcoo(A)
    assert M.shape == (128, 128)
    B = from_bcoo(M)
    np.testing.assert_allclose(B.to_dense(), A.to_dense(), rtol=1e-6)


def test_bcoo_matvec_agrees():
    import jax.numpy as jnp

    A = random_csr(100, 80, nnz=500, seed=5)
    M = to_bcoo(A)
    x = np.random.default_rng(3).standard_normal(80).astype(np.float32)
    np.testing.assert_allclose(np.asarray(M @ jnp.asarray(x)),
                               spmv_ref(A, x), rtol=1e-4, atol=1e-5)


def test_from_bcoo_sums_duplicates():
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    indices = jnp.array([[0, 1], [0, 1], [2, 0]], jnp.int32)
    data = jnp.array([1.0, 2.0, 5.0], jnp.float32)
    M = jsparse.BCOO((data, indices), shape=(3, 3))
    A = from_bcoo(M)
    assert A.nnz == 2
    D = A.to_dense()
    assert D[0, 1] == 3.0 and D[2, 0] == 5.0


def test_from_bcoo_rejects_batched():
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    M = jsparse.BCOO.fromdense(jnp.ones((2, 3, 3)), n_batch=1)
    with pytest.raises(ValueError, match="unbatched"):
        from_bcoo(M)
