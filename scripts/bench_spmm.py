"""SpMM TPU benchmark: window kernel vs XLA fallback (VERDICT r1
item 7 'done' check), plus the raw XLA row-gather / segment-sum rates
that motivated the window design.

Usage: python -u scripts/bench_spmm.py [nnz] [n_rows] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(nnz=5_000_000, n_rows=1 << 19, B=128):
    import jax
    import jax.numpy as jnp

    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.kernels.spmm import spmm_window, spmm_xla
    from spmv_tpu.utils.timing import benchmark_fn

    A = power_law_csr(n_rows, n_rows, nnz, alpha=1.5, seed=21)
    print(f"matrix {A.n_rows}x{A.n_cols} nnz={A.nnz} B={B}", flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((A.n_cols, B)).astype(np.float32))

    # dense-oracle check on a row slice (full dense is too large)
    ref_rows = 2048
    d = np.zeros((ref_rows, A.n_cols), np.float64)
    Ap = np.asarray(A.Ap)
    Aj = np.asarray(A.Aj)
    Ax = np.asarray(A.Ax, np.float64)
    for r in range(ref_rows):
        d[r, Aj[Ap[r]:Ap[r + 1]]] += Ax[Ap[r]:Ap[r + 1]]
    Yref = d @ np.asarray(X, np.float64)

    for name, fn in (("window", spmm_window), ("xla", spmm_xla)):
        try:
            t0 = time.perf_counter()
            Y = np.asarray(fn(A, X))
            print(f"{name}: first call {time.perf_counter()-t0:.1f}s",
                  flush=True)
            rel = np.abs(Y[:ref_rows] - Yref).max() / max(
                np.abs(Yref).max(), 1.0)
            print(f"{name}: rel={rel:.2e}", flush=True)
            total, kern = benchmark_fn(lambda v: fn(A, v), X, iters=10)
            gn = A.nnz / kern / 1e9
            print(f"{name}: kernel {kern*1e3:.2f} ms  {gn:.3f} Gnnz/s "
                  f"({gn*2*B:.0f} GFLOP/s at B={B})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: {type(e).__name__}: {e}", flush=True)

    # raw primitive rates at this size (design inputs)
    from spmv_tpu.utils.timing import benchmark_fn as bfn

    P = jnp.asarray(rng.standard_normal((A.nnz, 128)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(A.nnz).astype(np.int32))

    def take_rows(p):
        return jnp.take(p, perm, axis=0)

    total, kern = bfn(take_rows, P, iters=10)
    print(f"XLA row-take (nnz,128): {kern*1e3:.2f} ms = "
          f"{2*P.nbytes/kern/1e9:.0f} GB/s", flush=True)

    rows = jnp.asarray(np.sort(rng.integers(0, n_rows, A.nnz))
                       .astype(np.int32))

    def segsum(p):
        return jax.ops.segment_sum(p, rows, num_segments=n_rows,
                                   indices_are_sorted=True)

    total, kern = bfn(segsum, P, iters=10)
    print(f"XLA sorted segment-sum (nnz,128): {kern*1e3:.2f} ms = "
          f"{P.nbytes/kern/1e9:.0f} GB/s-in", flush=True)


if __name__ == "__main__":
    nnz = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 19
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    main(nnz, rows, B)
