"""CPU reference oracle for SpMV, plain and semiring-generalized.

Mirrors the reference oracle (ref: include/spmv/cpu_navie.hpp:3-35):
a row-loop y = A·x in float64 accumulation, used by the benchmark
harness and tests as ground truth. Uses NumPy (vectorized) — the
semantics, not the loop, are what we reproduce.
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES


def spmv_ref(A: CSR, x, y_dtype=None) -> np.ndarray:
    """Plain (+,×) CSR SpMV oracle (ref: cpu_navie.hpp:3-17).

    Accumulates in float64 regardless of storage dtype so the oracle
    is strictly more accurate than any device kernel.
    """
    Ap = np.asarray(A.Ap, dtype=np.int64)
    Aj = np.asarray(A.Aj, dtype=np.int64)
    Ax = np.asarray(A.Ax, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    prod = Ax * x[Aj]
    # Row sums via reduceat on row starts (empty rows handled explicitly).
    y = np.zeros(A.n_rows, dtype=np.float64)
    lens = Ap[1:] - Ap[:-1]
    nonempty = np.nonzero(lens > 0)[0]
    if nonempty.size:
        y[nonempty] = np.add.reduceat(prod, Ap[nonempty])
    if y_dtype is None:
        y_dtype = np.asarray(A.Ax).dtype
    return y.astype(y_dtype)


def spmv_ref_semiring(A: CSR, x, semiring: Semiring = PLUS_TIMES, y_dtype=None) -> np.ndarray:
    """Generalized semiring SpMV oracle (ref: cpu_navie.hpp:20-35).

    y[i] = reduce over j in row i of combine(A[i,j], x[j]), starting
    from initialize(). Empty rows yield the identity.
    """
    Ap = np.asarray(A.Ap, dtype=np.int64)
    Aj = np.asarray(A.Aj, dtype=np.int64)
    Ax = np.asarray(A.Ax)
    x = np.asarray(x)
    if y_dtype is None:
        y_dtype = np.result_type(Ax.dtype, x.dtype)
    ident = semiring.identity_for(y_dtype)
    y = np.full(A.n_rows, ident, dtype=y_dtype)
    # Row loop — intentionally the trivially-correct formulation.
    for i in range(A.n_rows):
        acc = ident
        for k in range(Ap[i], Ap[i + 1]):
            term = np.asarray(semiring.combine(Ax[k], x[Aj[k]])).astype(y_dtype)
            acc = np.asarray(semiring.reduce(acc, term)).astype(y_dtype)
        y[i] = acc
    return y


def correctness_delta(y_ref, y) -> dict:
    """The reference's correctness metric: sum and per-row mean of |Δ|
    (ref: main.cu:84-97), extended with max |Δ| and relative error.
    """
    y_ref = np.asarray(y_ref, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    d = np.abs(y_ref - y)
    denom = np.maximum(np.abs(y_ref), 1.0)
    return {
        "sum_abs": float(d.sum()),
        "mean_abs": float(d.mean()) if d.size else 0.0,
        "max_abs": float(d.max()) if d.size else 0.0,
        "max_rel": float((d / denom).max()) if d.size else 0.0,
    }
