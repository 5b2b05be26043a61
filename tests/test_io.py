"""Matrix Market I/O tests (load.hpp:163-408 parity)."""

import io

import numpy as np
import pytest

from spmv_tpu.io.matrix_market import (
    MatrixMarketError,
    parse_banner,
    read_matrix_market,
    write_matrix_market,
)

GENERAL = """%%MatrixMarket matrix coordinate real general
% a comment
3 4 5
1 1 1.0
1 4 2.0
2 2 3.0
3 1 4.0
3 3 5.0
"""

SYMMETRIC = """%%MatrixMarket matrix coordinate real symmetric
3 3 4
1 1 1.0
2 1 2.0
3 2 3.0
3 3 4.0
"""

PATTERN = """%%MatrixMarket matrix coordinate pattern general
2 2 3
1 1
1 2
2 1
"""

INTEGER = """%%MatrixMarket matrix coordinate integer general
2 2 2
1 1 7
2 2 -3
"""

SKEW = """%%MatrixMarket matrix coordinate real skew-symmetric
3 3 2
2 1 5.0
3 2 -1.0
"""


def _read(text, **kw):
    return read_matrix_market(io.StringIO(text), **kw)


def test_general():
    coo = _read(GENERAL)
    assert (coo.n_rows, coo.n_cols, coo.nnz) == (3, 4, 5)
    d = coo.to_dense()
    assert d[0, 0] == 1.0 and d[0, 3] == 2.0 and d[2, 2] == 5.0


def test_symmetric_expansion():
    # Off-diagonals duplicated transposed (ref: load.hpp:362-403).
    coo = _read(SYMMETRIC)
    assert coo.nnz == 6  # 4 entries + 2 off-diagonal mirrors
    d = coo.to_dense()
    np.testing.assert_allclose(d, d.T)
    assert d[1, 0] == 2.0 and d[0, 1] == 2.0


def test_pattern_values_are_one():
    coo = _read(PATTERN)  # ref: load.hpp:317-334
    np.testing.assert_array_equal(np.asarray(coo.vals), [1.0, 1.0, 1.0])


def test_integer_field():
    coo = _read(INTEGER, value_dtype=np.int32)
    assert np.asarray(coo.vals).dtype == np.int32
    assert coo.to_dense()[1, 1] == -3


def test_skew_symmetric():
    coo = _read(SKEW)
    d = coo.to_dense()
    assert d[1, 0] == 5.0 and d[0, 1] == -5.0
    np.testing.assert_allclose(d, -d.T)


def test_as_csr():
    csr = _read(GENERAL, as_csr=True)
    assert np.asarray(csr.Ap).tolist() == [0, 2, 3, 5]


def test_banner_errors():
    with pytest.raises(MatrixMarketError):
        parse_banner("%%MatrixMarket matrix coordinate real bogus")
    with pytest.raises(MatrixMarketError):
        parse_banner("not a banner at all")
    with pytest.raises(MatrixMarketError):
        _read("%%MatrixMarket matrix coordinate complex general\n1 1 1\n1 1 1 1\n")


def test_zero_based_rejected():
    # ref: load.hpp rejects 0-based files.
    bad = "%%MatrixMarket matrix coordinate real general\n2 2 1\n0 1 1.0\n"
    with pytest.raises(MatrixMarketError):
        _read(bad)


def test_index_exceeds_dims():
    bad = "%%MatrixMarket matrix coordinate real general\n2 2 1\n3 1 1.0\n"
    with pytest.raises(MatrixMarketError):
        _read(bad)


def test_roundtrip(tmp_path):
    coo = _read(GENERAL)
    p = tmp_path / "m.mtx"
    write_matrix_market(p, coo, comment="roundtrip")
    coo2 = read_matrix_market(p)
    np.testing.assert_allclose(coo.to_dense(), coo2.to_dense())
