"""Row partitioning of CSR matrices for multi-chip execution.

The reference is single-GPU (ref: common.cuh:8 `USED_DEVICE 0`,
SURVEY §2 'Distributed communication backend: none'); this layer is
the NEW capability the TPU build adds (SURVEY §7 step 6, BASELINE.json
north-star): a 1-D row partition balanced by nnz (the merge-path idea
lifted to the chip level — each chip gets an equal share of
rows+nnz work), per-chip local CSR blocks, and the halo structure
(which x entries each chip actually reads).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from spmv_tpu.formats import CSR


@dataclasses.dataclass
class RowPartition:
    """A 1-D row partition of a CSR matrix into n_shards blocks."""

    n_shards: int
    row_starts: np.ndarray  # (n_shards+1,) global first row per shard
    # Padded per-shard local CSR, stacked on axis 0:
    rows_per_shard: int  # padded local row count R
    nnz_per_shard: int  # padded local nnz N
    Ap: np.ndarray  # (n_shards, R+1) int32 local offsets (padded rows are empty)
    Aj: np.ndarray  # (n_shards, N) int32 GLOBAL column indices
    Ax: np.ndarray  # (n_shards, N) values (padding = 0)
    # Halo structure: which global x entries each shard reads.
    halo_counts: np.ndarray  # (n_shards,) distinct columns touched

    @property
    def n_rows_padded(self) -> int:
        return self.n_shards * self.rows_per_shard


def partition_rows(A: CSR, n_shards: int, balance: str = "merge") -> RowPartition:
    """Split rows into contiguous shards.

    balance='merge': equalize rows + nnz per shard (the merge-path
    diagonal split applied at chip granularity); 'rows': equal row
    counts.
    """
    Ap = np.asarray(A.Ap, dtype=np.int64)
    Aj = np.asarray(A.Aj)
    Ax = np.asarray(A.Ax)
    n_rows, nnz = A.n_rows, int(Ap[-1])

    if balance == "rows" or nnz == 0:
        row_starts = np.linspace(0, n_rows, n_shards + 1).astype(np.int64)
    else:
        # merge balance: shard s gets merge items [s*I/n, (s+1)*I/n),
        # items = rows + nnz; boundary row r minimizes |(r + Ap[r]) - d|.
        items = n_rows + nnz
        diags = (np.arange(1, n_shards) * items) // n_shards
        merge_pos = np.arange(n_rows + 1) + Ap  # r + Ap[r], increasing
        cuts = np.searchsorted(merge_pos, diags, side="left")
        row_starts = np.concatenate([[0], cuts, [n_rows]]).astype(np.int64)
        row_starts = np.maximum.accumulate(row_starts)

    R = int(max((row_starts[1:] - row_starts[:-1]).max(), 1))
    local_nnz = Ap[row_starts[1:]] - Ap[row_starts[:-1]]
    N = int(max(local_nnz.max(), 1))
    # Round padded sizes up for friendlier tiling.
    N = -(-N // 128) * 128
    R = max(R, 1)

    Ap_l = np.zeros((n_shards, R + 1), dtype=np.int64)
    Aj_l = np.zeros((n_shards, N), dtype=np.int64)
    Ax_l = np.zeros((n_shards, N), dtype=Ax.dtype if Ax.size else np.float32)
    halo_counts = np.zeros(n_shards, dtype=np.int64)
    for s in range(n_shards):
        r0, r1 = row_starts[s], row_starts[s + 1]
        k0, k1 = Ap[r0], Ap[r1]
        nl = int(k1 - k0)
        offs = Ap[r0 : r1 + 1] - k0
        Ap_l[s, : r1 - r0 + 1] = offs
        Ap_l[s, r1 - r0 + 1 :] = nl  # padded rows are empty
        Aj_l[s, :nl] = Aj[k0:k1]
        Ax_l[s, :nl] = Ax[k0:k1]
        halo_counts[s] = np.unique(Aj[k0:k1]).size if nl else 0

    if int(Ap_l.max()) > np.iinfo(np.int32).max or N > np.iinfo(np.int32).max:
        raise OverflowError("shard exceeds int32 offsets; increase n_shards")
    return RowPartition(
        n_shards=n_shards,
        row_starts=row_starts,
        rows_per_shard=R,
        nnz_per_shard=N,
        Ap=Ap_l.astype(np.int32),
        Aj=Aj_l.astype(np.int32),
        Ax=Ax_l,
        halo_counts=halo_counts,
    )
