"""Single-source shortest paths via min-plus semiring SpMV.

The generalized-semiring kernels (the reference's merge_genl
capability, ref: include/spmv/merge_genl/*) make graph algorithms
one-liners: with the (min, +) semiring, y = A (x) d relaxes every
edge once, and iterating to a fixed point is Bellman-Ford. Distances
here live in a dense vector; inf is the semiring identity.

Run: python examples/shortest_paths.py [n] [kind]
"""

import sys

import numpy as np

from spmv_tpu import MIN_PLUS, coo_to_csr, spmv
from spmv_tpu.formats import COO


def random_graph(n: int, deg: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n), deg)
    dst = rng.integers(0, n, n * deg)
    w = rng.uniform(0.1, 1.0, n * deg).astype(np.float32)
    keep = src != dst
    # transpose so y[i] = min_j (A[i,j] + x[j]) relaxes edges INTO i
    return coo_to_csr(COO(n, n, dst[keep], src[keep], w[keep]),
                      sum_duplicates=False)


def sssp(A, source: int, kind: str = "merge_genl", max_iter=None):
    n = A.n_rows
    d = np.full(n, np.inf, np.float32)
    d[source] = 0.0
    if max_iter is None:
        max_iter = n
    for it in range(max_iter):
        relaxed = np.asarray(spmv(kind, A, d, semiring=MIN_PLUS))
        nd = np.minimum(d, relaxed)
        if np.allclose(nd, d, equal_nan=True):
            return nd, it + 1
        d = nd
    return d, max_iter


def dijkstra_ref(A, source: int):
    import heapq

    Ap, Aj, Ax = (np.asarray(A.Ap), np.asarray(A.Aj), np.asarray(A.Ax))
    # A is transposed (in-edges); invert back for the reference walk
    n = A.n_rows
    out = [[] for _ in range(n)]
    for i in range(n):
        for t in range(Ap[i], Ap[i + 1]):
            out[Aj[t]].append((i, Ax[t]))
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist[u]:
            continue
        for v, w in out[u]:
            if d + w < dist[v]:
                dist[v] = d + w
                heapq.heappush(pq, (dist[v], v))
    return dist


def main(n=2000, kind="merge_genl"):
    A = random_graph(n)
    d, iters = sssp(A, 0, kind=kind)
    ref = dijkstra_ref(A, 0)
    reach = np.isfinite(ref)
    err = np.abs(d[reach] - ref[reach]).max() if reach.any() else 0.0
    print(f"n={n} kind={kind}: converged in {iters} relaxations, "
          f"{int(reach.sum())}/{n} reachable, max |d - dijkstra| = {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    kind = sys.argv[2] if len(sys.argv) > 2 else "merge_genl"
    main(n, kind)
