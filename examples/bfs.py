"""Breadth-first search via boolean (or, and) semiring SpMV.

Classic GraphBLAS formulation: one BFS level is one SpMV of the
frontier indicator vector under the boolean semiring — y[i] = OR_j
(A^T[i,j] AND f[j]) marks every vertex with an in-edge from the
frontier. The generalized-semiring kernels (the reference's
merge_genl capability, ref: include/spmv/merge_genl/*) run this
through the exact same device pipeline as numeric SpMV.

Run: python examples/bfs.py [--kind merge_genl] [--nodes 20000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bfs(A_t, source: int, kind: str):
    """BFS levels on the graph whose transposed adjacency is A_t.

    Returns level[i] = hop distance from source (-1 if unreachable).
    """
    import jax.numpy as jnp

    from spmv_tpu import OR_AND, spmv

    n = A_t.n_rows
    level = np.full(n, -1, np.int32)
    level[source] = 0
    frontier = jnp.zeros((n,), jnp.float32).at[source].set(1.0)
    visited = frontier
    for depth in range(1, n):
        reached = spmv(kind, A_t, frontier, semiring=OR_AND)
        frontier = jnp.where(visited > 0, 0.0, reached)
        new = np.flatnonzero(np.asarray(frontier) > 0)
        if new.size == 0:
            return level, depth - 1
        level[new] = depth
        visited = jnp.maximum(visited, frontier)
    return level, n


def bfs_ref(A_t, source: int):
    """Host BFS over the same in-edge CSR (adjacency-list queue walk)."""
    Ap, Aj = np.asarray(A_t.Ap), np.asarray(A_t.Aj)
    n = A_t.n_rows
    # invert the in-edge structure back to out-edges once
    out = [[] for _ in range(n)]
    for i in range(n):
        for t in range(Ap[i], Ap[i + 1]):
            out[Aj[t]].append(i)
    level = np.full(n, -1, np.int32)
    level[source] = 0
    q = [source]
    while q:
        nq = []
        for u in q:
            for v in out[u]:
                if level[v] < 0:
                    level[v] = level[u] + 1
                    nq.append(v)
        q = nq
    return level


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", default="merge_genl")
    p.add_argument("--nodes", type=int, default=20_000)
    p.add_argument("--edges", type=int, default=120_000)
    p.add_argument("--source", type=int, default=-1,
                   help="source vertex (default: max out-degree hub)")
    args = p.parse_args()

    from spmv_tpu.io.generate import power_law_csr

    G = power_law_csr(args.nodes, args.nodes, args.edges, alpha=1.6,
                      seed=5)
    A_t = G.transpose()  # y = A^T f expands the frontier along out-edges
    if args.source < 0:
        args.source = int(np.argmax(G.row_lengths()))
    print(f"graph: {args.nodes} nodes, {G.nnz} edges; kind={args.kind}, "
          f"source={args.source}", flush=True)

    t0 = time.perf_counter()
    level, depth = bfs(A_t, args.source, args.kind)
    dt = time.perf_counter() - t0
    reach = int((level >= 0).sum())
    print(f"BFS done: eccentricity {depth}, {reach} reachable "
          f"({dt:.2f}s, {dt/max(depth,1)*1e3:.1f} ms/level)")

    ref = bfs_ref(A_t, args.source)
    assert np.array_equal(level, ref), "levels disagree with host BFS"
    print("host-BFS oracle: exact match")


if __name__ == "__main__":
    main()
