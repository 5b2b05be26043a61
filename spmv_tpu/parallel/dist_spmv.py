"""Multi-chip SpMV over a device mesh (shard_map + ICI collectives).

The new layer the single-GPU reference lacks (SURVEY §2/§7): rows are
partitioned per chip (nnz-balanced, see partition.py); x shards are
all-gathered over the mesh axis (ICI) and each chip runs its local
SpMV on its CSR block; y comes back row-sharded. No NCCL/MPI
translation — the collective is XLA's `all_gather` placed by
`shard_map`, which on a TPU pod slice rides ICI links.

Design notes:
- v1 gathers all of x (correct for any sparsity); the halo-compacted
  overlap (gather only the columns a shard reads, overlapped with
  local compute) is the planned optimization — `RowPartition.
  halo_counts` already measures the win.
- Local compute is the XLA gather+segment-sum path: inside shard_map
  every chip executes it independently, so per-chip performance equals
  the single-chip ``xla`` kind; Pallas local kernels can be swapped in
  without touching the communication structure.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from spmv_tpu.formats import CSR
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES
from spmv_tpu.parallel.partition import RowPartition, partition_rows


@dataclasses.dataclass
class DistributedSpMV:
    """A CSR matrix distributed over one mesh axis, ready for matvec."""

    mesh: Mesh
    axis: str
    part: RowPartition
    n_rows: int
    n_cols: int
    # Device-placed, sharded arrays:
    Ap: jax.Array  # (n, R+1) int32
    Aj: jax.Array  # (n, N) int32 global columns
    Ax: jax.Array  # (n, N)
    row_ids: jax.Array  # (n, N) int32 local row of each nnz (pad -> R)
    nnz_local: jax.Array  # (n, 1) int32
    unpad_idx: jax.Array  # (n_rows,) int32 into flattened (n*R,) local y
    x_pad: int  # padded n_cols (multiple of n)

    def shard_x(self, x) -> jax.Array:
        """Pad and shard a global x over the mesh axis."""
        x = jnp.asarray(x)
        xp = jnp.zeros((self.x_pad,), x.dtype).at[: self.n_cols].set(x)
        return jax.device_put(
            xp, NamedSharding(self.mesh, P(self.axis))
        )

    def matvec(self, x, semiring: Semiring = PLUS_TIMES) -> jax.Array:
        """y = A·x with x/y row-sharded over the mesh axis.

        Accepts a global (replicated or host) x of shape (n_cols,) or an
        already padded+sharded (x_pad,) vector.
        """
        x = jnp.asarray(x)
        if x.shape[0] == self.n_cols and self.n_cols != self.x_pad:
            x = self.shard_x(x)
        return _dist_matvec(
            self.Ap, self.Aj, self.Ax, self.row_ids, self.nnz_local,
            self.unpad_idx, x,
            mesh=self.mesh, axis=self.axis,
            R=self.part.rows_per_shard, sr_name=semiring.name,
        )


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "R", "sr_name")
)
def _dist_matvec(Ap, Aj, Ax, row_ids, nnz_local, unpad_idx, x,
                 *, mesh, axis, R, sr_name):
    from spmv_tpu.ops.semiring import BUILTIN_SEMIRINGS

    sr = BUILTIN_SEMIRINGS[sr_name]
    ident = float(sr.identity_for(np.dtype(Ax.dtype)))

    def local(Ap_l, Aj_l, Ax_l, rid_l, nnz_l, x_l):
        # ICI collective: gather the x shards (v1 full gather).
        x_full = jax.lax.all_gather(x_l, axis, tiled=True)
        prod = sr.combine(Ax_l[0], jnp.take(x_full, Aj_l[0]))
        valid = jax.lax.broadcasted_iota(jnp.int32, prod.shape, 0) < nnz_l[0, 0]
        prod = jnp.where(valid, prod, ident)
        rid = jnp.where(valid, rid_l[0], R)  # pad segment R is dropped
        if sr_name == "plus_times":
            y = jax.ops.segment_sum(prod, rid, num_segments=R + 1)
        elif sr_name == "min_plus":
            y = jax.ops.segment_min(prod, rid, num_segments=R + 1)
        else:
            y = jax.ops.segment_max(prod, rid, num_segments=R + 1)
        y = y[:R]
        # The identity participates in every row reduction (the oracle
        # starts acc at initialize(), ref: cpu_navie.hpp:20-35); this
        # also normalizes segment_min/max's ±inf fill on empty rows.
        y = sr.reduce(y, jnp.full_like(y, ident))
        return y[None, :]

    y_sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis, None),
    )(Ap, Aj, Ax, row_ids, nnz_local, x)
    # Assemble global y by the precomputed unpad gather; result is
    # computed from row-sharded blocks, output follows unpad_idx's sharding.
    y_flat = y_sharded.reshape(-1)
    return jnp.take(y_flat, unpad_idx)


def distribute_csr(
    A: CSR,
    mesh: Mesh,
    axis: str = "shards",
    balance: str = "merge",
) -> DistributedSpMV:
    n = mesh.shape[axis]
    part = partition_rows(A, n, balance=balance)
    R, N = part.rows_per_shard, part.nnz_per_shard

    # Local row ids per nnz (pad entries -> R, masked at runtime anyway).
    row_ids = np.full((n, N), R, dtype=np.int32)
    nnz_local = np.zeros((n, 1), dtype=np.int32)
    for s in range(n):
        nl = int(part.Ap[s, -1])
        nnz_local[s, 0] = nl
        lens = np.diff(part.Ap[s].astype(np.int64))
        row_ids[s, :nl] = np.repeat(np.arange(R, dtype=np.int32), lens)

    row_starts = part.row_starts
    shard_of = np.searchsorted(row_starts, np.arange(A.n_rows), side="right") - 1
    unpad_idx = (shard_of * R + (np.arange(A.n_rows) - row_starts[shard_of])).astype(np.int32)

    x_pad = -(-A.n_cols // n) * n

    shd = NamedSharding(mesh, P(axis, None))
    put = lambda a: jax.device_put(jnp.asarray(a), shd)
    return DistributedSpMV(
        mesh=mesh,
        axis=axis,
        part=part,
        n_rows=A.n_rows,
        n_cols=A.n_cols,
        Ap=put(part.Ap),
        Aj=put(part.Aj),
        Ax=put(part.Ax),
        row_ids=put(row_ids),
        nnz_local=put(nnz_local),
        unpad_idx=jnp.asarray(unpad_idx),
        x_pad=x_pad,
    )
