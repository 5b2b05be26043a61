"""Tests for the stream-SpMV flagship kernel (kernels/stream.py)."""

import numpy as np
import pytest

from spmv_tpu import MIN_PLUS, spmv, spmv_ref, spmv_ref_semiring
from spmv_tpu.io.generate import banded_csr, power_law_csr, random_csr


def _check(A, seed=0, rtol=2e-4, atol=1e-5):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(A.n_cols).astype(np.float32)
    y = np.asarray(spmv("stream", A, x))
    y_ref = spmv_ref(A, x, y_dtype=np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=rtol, atol=atol)


def test_stream_random():
    _check(random_csr(20000, 30000, 150000, seed=1))


def test_stream_power_law_rows():
    _check(power_law_csr(16384, 20000, 120000, alpha=1.5, seed=2))


def test_stream_banded():
    _check(banded_csr(30000, bandwidth=3, seed=3))


def test_stream_hot_columns():
    # concentrate half the nnz on a handful of columns (hot replication)
    rng = np.random.default_rng(4)
    n, nnz = 20000, 120000
    rows = rng.integers(0, n, nnz).astype(np.int64)
    cols = np.where(rng.random(nnz) < 0.5,
                    rng.integers(0, 5, nnz),
                    rng.integers(0, n, nnz)).astype(np.int64)
    vals = rng.standard_normal(nnz)
    from spmv_tpu.formats import COO, coo_to_csr

    A = coo_to_csr(COO(n, n, rows.astype(np.int32), cols.astype(np.int32),
                       vals.astype(np.float32)))
    _check(A)


def test_stream_semiring_min_plus():
    A = random_csr(8192, 8192, 60000, seed=5)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(A.n_cols).astype(np.float32)
    y = np.asarray(spmv("stream", A, x, semiring=MIN_PLUS))
    y_ref = spmv_ref_semiring(A, x, MIN_PLUS)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_stream_empty_rows_and_tail():
    # rows beyond the last nnz and 1024-row gaps must come out as 0
    rng = np.random.default_rng(6)
    n = 50000
    rows = rng.integers(0, 20000, 80000).astype(np.int64)  # top rows empty
    cols = rng.integers(0, n, 80000).astype(np.int64)
    from spmv_tpu.formats import COO, coo_to_csr

    A = coo_to_csr(COO(n, n, rows.astype(np.int32), cols.astype(np.int32),
                       rng.standard_normal(80000).astype(np.float32)))
    _check(A)


def test_stream_reduce_forced_on():
    # early reduction (pass 0): row-skewed matrix, reduce='on'
    from spmv_tpu.kernels.stream import StreamPolicy, _stream_spmv
    from spmv_tpu.ops.semiring import PLUS_TIMES

    A = power_law_csr(16384, 16384, 90000, alpha=1.5, seed=11)
    rng = np.random.default_rng(11)
    x = rng.standard_normal(A.n_cols).astype(np.float32)
    pol = StreamPolicy(kappa=4096, reduce="on")
    y = np.asarray(_stream_spmv(A, x, PLUS_TIMES, pol))
    y_ref = spmv_ref(A, x, y_dtype=np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=1e-5)


def test_stream_reduce_matches_no_reduce():
    from spmv_tpu.kernels.stream import StreamPolicy, _stream_spmv
    from spmv_tpu.ops.semiring import PLUS_TIMES

    A = power_law_csr(16384, 16384, 60000, alpha=1.5, seed=12)
    rng = np.random.default_rng(12)
    x = rng.standard_normal(A.n_cols).astype(np.float32)
    y_on = np.asarray(_stream_spmv(
        A, x, PLUS_TIMES, StreamPolicy(kappa=4096, reduce="on")))
    y_off = np.asarray(_stream_spmv(
        A, x, PLUS_TIMES, StreamPolicy(kappa=4096, reduce="off")))
    np.testing.assert_allclose(y_on, y_off, rtol=2e-4, atol=1e-5)


def test_stream_reduce_plan_gates():
    # auto reduction declines when there is no row duplication to win
    from spmv_tpu.kernels.stream import (
        StreamPolicy, _plan_gather_reduce, REDUCE_MIN_FACTOR)

    # wide uniform-random matrix: ~1 nnz per (tile, sublane, row) run
    A = random_csr(300000, 300000, 120000, seed=13)
    Ap = np.asarray(A.Ap, np.int64)
    Aj = np.asarray(A.Aj, np.int64)
    row_ids = np.repeat(np.arange(A.n_rows, dtype=np.int64),
                        np.diff(Ap))
    res = _plan_gather_reduce(
        Aj, row_ids, StreamPolicy(), -(-A.n_cols // (128 * 128)))
    assert res is None  # duplication below REDUCE_MIN_FACTOR

    # skewed rows: accepted, and the run count shows real reduction
    B = power_law_csr(16384, 16384, 90000, alpha=1.5, seed=14)
    Bp = np.asarray(B.Ap, np.int64)
    Bj = np.asarray(B.Aj, np.int64)
    brows = np.repeat(np.arange(B.n_rows, dtype=np.int64), np.diff(Bp))
    res = _plan_gather_reduce(
        Bj, brows, StreamPolicy(), -(-B.n_cols // (128 * 128)))
    assert res is not None
    assert B.nnz / res[4]["n_runs"] >= REDUCE_MIN_FACTOR


def test_stream_reduce_semiring_falls_back():
    # non-invertible rings must not take the prefix-difference pass
    from spmv_tpu.ops.registry import plan_cached

    A = power_law_csr(8192, 8192, 50000, alpha=1.5, seed=15)
    rng = np.random.default_rng(15)
    x = rng.standard_normal(A.n_cols).astype(np.float32)
    y = np.asarray(spmv("stream", A, x, semiring=MIN_PLUS))
    y_ref = spmv_ref_semiring(A, x, MIN_PLUS)
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_banded_execution_matches_oracle(monkeypatch):
    """Past the planner's reach the stream pipeline runs in row bands
    (VERDICT r3 item 9); forced small bands exercise the cut +
    concat + hub-row no-progress guard."""
    from spmv_tpu.kernels import stream as st
    from spmv_tpu.ops.semiring import PLUS_TIMES

    monkeypatch.setattr(st, "BAND_NNZ", 40000)
    A = power_law_csr(1 << 16, 1 << 16, 120000, alpha=1.5, seed=1)
    x = np.random.default_rng(0).standard_normal(1 << 16).astype(np.float32)
    y = np.asarray(st._stream_spmv(
        A, x, PLUS_TIMES, st.StreamPolicy(kappa=4096)))
    y_ref = spmv_ref(A, x, y_dtype=np.float64)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=1e-4)
