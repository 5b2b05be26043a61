"""Chunked host->device transfers.

The tunneled runtime rejects single transfer requests above roughly
~220 MB (HTTP 413); large plan arrays (stream plans at >=60M nnz) must
go up in slices and be stitched on device. On a direct-attached
runtime this is still harmless (a handful of device_put + one concat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CHUNK_BYTES = 128 * 1024 * 1024


def device_put_chunked(arr: np.ndarray, chunk_bytes: int = CHUNK_BYTES):
    """device_put `arr` (2-D, chunked along axis 0 when large)."""
    a = np.asarray(arr)
    if a.nbytes <= chunk_bytes or a.ndim == 0 or a.shape[0] <= 1:
        return jnp.asarray(a)
    rows_per = max(1, chunk_bytes // max(a[0:1].nbytes, 1))
    parts = [jax.device_put(a[i:i + rows_per])
             for i in range(0, a.shape[0], rows_per)]
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)
