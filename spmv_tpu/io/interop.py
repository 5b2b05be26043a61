"""Interop: scipy.sparse and jax.experimental.sparse.BCOO converters.

The reference library's only ingress is its Matrix Market loader
(ref: include/load.hpp:268-408). A standalone Python framework also
needs zero-copy-ish bridges to the two sparse ecosystems users
already hold data in: scipy.sparse (the de-facto host format) and
JAX's own BCOO (so spmv_tpu kernels can accelerate code already
written against jax.experimental.sparse).

All converters preserve dtypes (the 5-way genericity contract,
ref: include/spmv.h:29-34). scipy is imported lazily so the core
package works without it.
"""

from __future__ import annotations

import numpy as np

from spmv_tpu.formats import COO, CSR, coo_to_csr


def _scipy_sparse():
    try:
        import scipy.sparse as sp
        return sp
    except ImportError as e:  # pragma: no cover - scipy is in the image
        raise ImportError(
            "scipy is required for scipy.sparse interop") from e


def from_scipy(mat, *, offset_dtype=None, index_dtype=None) -> CSR:
    """Any scipy.sparse matrix/array → CSR.

    Non-CSR inputs are converted via scipy's own tocsr() (which sums
    duplicates, matching scipy semantics). Index/offset dtypes default
    to whatever scipy used (int32 or int64 by size).
    """
    sp = _scipy_sparse()
    if not sp.issparse(mat):
        raise TypeError(f"expected a scipy.sparse matrix, got {type(mat)}")
    m = mat.tocsr()
    m.sort_indices()
    Ap = np.asarray(m.indptr)
    Aj = np.asarray(m.indices)
    if offset_dtype is not None:
        Ap = Ap.astype(offset_dtype)
    if index_dtype is not None:
        Aj = Aj.astype(index_dtype)
    return CSR(int(m.shape[0]), int(m.shape[1]), Ap, Aj,
               np.asarray(m.data))


def to_scipy(A: CSR):
    """CSR → scipy.sparse.csr_matrix (shares no plan state; plain copy)."""
    sp = _scipy_sparse()
    return sp.csr_matrix(
        (np.asarray(A.Ax), np.asarray(A.Aj), np.asarray(A.Ap)),
        shape=(A.n_rows, A.n_cols))


def from_bcoo(mat, *, offset_dtype=np.int32, index_dtype=None,
              sum_duplicates: bool = True) -> CSR:
    """jax.experimental.sparse.BCOO (unbatched, 2-D) → CSR.

    BCOO carries possibly-unsorted, possibly-duplicated coordinates;
    duplicates are summed by default (BCOO's own matvec semantics).
    """
    if mat.ndim != 2 or getattr(mat, "n_batch", 0) or getattr(mat, "n_dense", 0):
        raise ValueError(
            "only plain 2-D unbatched BCOO is supported, got "
            f"ndim={mat.ndim}, n_batch={getattr(mat, 'n_batch', '?')}, "
            f"n_dense={getattr(mat, 'n_dense', '?')}")
    idx = np.asarray(mat.indices)
    vals = np.asarray(mat.data)
    coo = COO(int(mat.shape[0]), int(mat.shape[1]),
              idx[:, 0].astype(np.int64), idx[:, 1].astype(np.int64), vals)
    return coo_to_csr(coo, offset_dtype=offset_dtype,
                      index_dtype=index_dtype,
                      sum_duplicates=sum_duplicates)


def to_bcoo(A: CSR):
    """CSR → jax.experimental.sparse.BCOO (sorted, unique indices)."""
    from jax.experimental import sparse as jsparse
    import jax.numpy as jnp

    rows = A.row_ids()
    indices = jnp.stack(
        [jnp.asarray(rows, jnp.int32),
         jnp.asarray(np.asarray(A.Aj), jnp.int32)], axis=1)
    return jsparse.BCOO((jnp.asarray(np.asarray(A.Ax)), indices),
                        shape=(A.n_rows, A.n_cols),
                        indices_sorted=True, unique_indices=False)
