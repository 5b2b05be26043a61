"""Validate stream-SpMV reach at >=100M nnz on TPU (VERDICT r1 item 9).

Builds a power-law synthetic past the old 60M-nnz planner cap, runs
the stream kernel end-to-end with chunked host->device transfers, and
checks against the float64 oracle.

Usage: python scripts/run_big_stream.py [nnz] [n_rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(nnz=100_000_000, n_rows=8 << 20):
    import jax.numpy as jnp

    from spmv_tpu import config, spmv, spmv_ref

    # plans this size take minutes to build; cache them on disk so
    # repeat runs (and post-crash retries) skip straight to the kernel
    config.set_plan_dir(os.environ.get("SPMV_TPU_PLAN_DIR",
                                       "scratch/plans"))
    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.utils.timing import benchmark_fn

    t0 = time.perf_counter()
    A = power_law_csr(n_rows, n_rows, nnz, alpha=1.5, seed=11)
    print(f"matrix built: {A.n_rows} rows, nnz={A.nnz} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    x = np.random.default_rng(0).standard_normal(n_rows).astype(np.float32)

    t0 = time.perf_counter()
    y = np.asarray(spmv("stream", A, jnp.asarray(x)))
    print(f"first call (plan+compile+run): {time.perf_counter()-t0:.0f}s",
          flush=True)

    # correctness vs float64 oracle
    y_ref = spmv_ref(A, x, y_dtype=np.float64)
    rel = np.abs(y - y_ref) / np.maximum(np.abs(y_ref), 1.0)
    print(f"max_rel={rel.max():.3e} mean_abs="
          f"{np.abs(y - y_ref).mean():.3e}", flush=True)
    assert rel.max() < 1e-3, "correctness failure"

    total, kern = benchmark_fn(
        lambda v: spmv("stream", A, v), jnp.asarray(x), iters=20)
    print(f"kernel {kern*1e3:.3f} ms -> {A.nnz/kern/1e9:.2f} Gnnz/s",
          flush=True)


if __name__ == "__main__":
    nnz = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8 << 20
    main(nnz, rows)
