"""Container and conversion tests (load.hpp parity)."""

import numpy as np
import pytest

from spmv_tpu.formats import COO, CSR, coo_to_csr, csr_from_dense


def test_coo_to_csr_roundtrip():
    rng = np.random.default_rng(0)
    n, m, nnz = 50, 40, 300
    rows = rng.integers(0, n, nnz).astype(np.int32)
    cols = rng.integers(0, m, nnz).astype(np.int32)
    vals = rng.standard_normal(nnz).astype(np.float32)
    coo = COO(n, m, rows, cols, vals)
    csr = coo_to_csr(coo)
    assert csr.nnz == nnz
    assert np.asarray(csr.Ap)[-1] == nnz
    np.testing.assert_allclose(csr.to_dense(), coo.to_dense())


def test_coo_to_csr_stable_row_order():
    # The reference's counting sort preserves per-row input order
    # (ref: load.hpp:420-474); duplicates stay in order.
    coo = COO(
        2, 3,
        np.array([1, 0, 1, 0], np.int32),
        np.array([2, 1, 0, 0], np.int32),
        np.array([1.0, 2.0, 3.0, 4.0], np.float32),
    )
    csr = coo_to_csr(coo)
    np.testing.assert_array_equal(np.asarray(csr.Ap), [0, 2, 4])
    np.testing.assert_array_equal(np.asarray(csr.Aj), [1, 0, 2, 0])
    np.testing.assert_array_equal(np.asarray(csr.Ax), [2.0, 4.0, 1.0, 3.0])


def test_sum_duplicates():
    coo = COO(
        2, 2,
        np.array([0, 0, 1], np.int32),
        np.array([1, 1, 0], np.int32),
        np.array([1.0, 2.0, 5.0], np.float32),
    )
    csr = coo_to_csr(coo, sum_duplicates=True)
    assert csr.nnz == 2
    dense = csr.to_dense()
    np.testing.assert_allclose(dense, [[0.0, 3.0], [5.0, 0.0]])


def test_empty_rows_and_matrix():
    coo = COO(4, 4, np.array([2], np.int32), np.array([3], np.int32),
              np.array([7.0], np.float32))
    csr = coo_to_csr(coo)
    np.testing.assert_array_equal(np.asarray(csr.Ap), [0, 0, 0, 1, 1])
    empty = coo_to_csr(COO(3, 3, np.zeros(0, np.int32), np.zeros(0, np.int32),
                           np.zeros(0, np.float32)))
    assert empty.nnz == 0
    assert np.asarray(empty.Ap).tolist() == [0, 0, 0, 0]


def test_out_of_range_raises():
    coo = COO(2, 2, np.array([2], np.int32), np.array([0], np.int32),
              np.array([1.0], np.float32))
    with pytest.raises(ValueError):
        coo_to_csr(coo)


def test_row_ids():
    csr = csr_from_dense(np.array([[1, 0], [2, 3], [0, 0]], np.float32))
    np.testing.assert_array_equal(csr.row_ids(), [0, 1, 1])


def test_dtype_genericity():
    # 5-way type parameterization analog (ref: spmv.h:29-34).
    coo = COO(3, 3, np.array([0, 2], np.int64), np.array([1, 2], np.int64),
              np.array([1.5, 2.5], np.float64))
    csr = coo_to_csr(coo, offset_dtype=np.int64, index_dtype=np.int16)
    assert np.asarray(csr.Ap).dtype == np.int64
    assert np.asarray(csr.Aj).dtype == np.int16
    assert np.asarray(csr.Ax).dtype == np.float64


def test_transpose():
    from spmv_tpu.io.generate import random_csr

    A = random_csr(300, 180, 2500, seed=12)
    At = A.transpose()
    assert (At.n_rows, At.n_cols) == (A.n_cols, A.n_rows)
    assert At.nnz == A.nnz
    np.testing.assert_array_equal(At.to_dense(), A.to_dense().T)
    # involution (dense equality; duplicate-free random_csr)
    np.testing.assert_array_equal(A.transpose().transpose().to_dense(),
                                  A.to_dense())
    # dtypes survive
    import numpy as _np
    A64 = A.astype(index_dtype=_np.int32, offset_dtype=_np.int64)
    At64 = A64.transpose()
    assert At64.Ap.dtype == _np.int64 and At64.Aj.dtype == _np.int32
