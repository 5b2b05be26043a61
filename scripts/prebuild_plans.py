"""Pre-build stream plans into the disk cache (scratch/plans).

Run host-side (no TPU needed) before a benchmarking session: the
expensive O(nnz) planning happens once here, and the TPU runs load
plans in seconds. Covers the driver bench matrix plus any sizes given
on the command line.

Usage: python scripts/prebuild_plans.py [nnz[:rows] ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prebuild(nnz: int, rows: int, seed: int, alpha: float = 1.5):
    import numpy as np

    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.kernels import stream as st
    from spmv_tpu.utils.plancache import plan_key, save_plan

    t0 = time.perf_counter()
    A = power_law_csr(rows, rows, nnz, alpha=alpha, seed=seed)
    key = plan_key(A, st.DEFAULT_POLICY)
    path = os.path.join("scratch/plans", f"stream-{key}.npz")
    if os.path.exists(path):
        print(f"nnz={nnz}: cached ({path})", flush=True)
        return
    plan = st.build_stream_plan(A, st.DEFAULT_POLICY)
    save_plan(plan, path)
    print(f"nnz={nnz}: built+saved in {time.perf_counter()-t0:.0f}s "
          f"-> {path} ({os.path.getsize(path)/1e6:.0f} MB)", flush=True)


def main(argv):
    # Planning is pure host work; pin the in-process backend to CPU so
    # a down TPU tunnel can't hang/fail the build (the axon runtime
    # forces jax_platforms in-process, so env vars alone don't stick).
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs("scratch/plans", exist_ok=True)
    # the driver bench matrix (bench.py)
    prebuild(3_300_000, 1 << 20, seed=42)
    for spec in argv:
        nnz, _, rows = spec.partition(":")
        nnz = int(nnz)
        rows = int(rows) if rows else 8 << 20
        prebuild(nnz, rows, seed=11)


if __name__ == "__main__":
    main(sys.argv[1:])
