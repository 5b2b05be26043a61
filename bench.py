"""Driver benchmark: one JSON line.

Metric: merge-path SpMV throughput (Gnnz/s) on a power-law synthetic
matrix (the load-imbalance regime the merge kernel targets,
BASELINE.json config 3), on the attached TPU chip.
vs_baseline: achieved fraction of the 80%-of-speed-of-light target
(BASELINE.md): 1.0 means the north-star target is met exactly.
"""

import json
import sys

import numpy as np

# Every registered device kind gets a TPU number on record
# (VERDICT r1 weak item 3); "stream" first so the headline metric is
# available even if a later kind fails, fast kinds before the direct
# ELL/tiled fallbacks so a driver timeout cuts the slow tail first.
ALL_KINDS = ("stream", "merge", "merge_genl", "merge_stock",
             "csr_vector_shfl", "csr_vector", "csr_vector_shfl2",
             "light_vec", "light_warp",
             "merge_tiled", "csr_vector_ell", "light_vec_ell",
             "csr_scalar", "xla")
TIME_BUDGET_S = 1500  # emit the JSON line even if the tail is cut


def probe_devices(timeout_s: int = 180) -> bool:
    """jax.devices() in a subprocess: the axon tunnel, when down,
    hangs backend init forever (in-process and unkillable); probing
    out-of-process lets the bench fail fast with an honest zero
    instead of hanging the driver."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not probe_devices():
        print("device backend unreachable (tunnel down?); emitting zero",
              file=sys.stderr)
        print(json.dumps({"metric": "spmv_gnnz_per_s", "value": 0.0,
                          "unit": "Gnnz/s", "vs_baseline": 0.0}))
        return

    from spmv_tpu import config
    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.utils.roofline import speed_of_light
    from spmv_tpu.utils.timing import benchmark_spmv

    # stream plans for the bench matrix are pre-built into the disk
    # cache (scripts/prebuild_plans.py); a cold cache just rebuilds
    config.set_plan_dir("scratch/plans")
    # persistent XLA compile cache: repeat runs skip the minutes of
    # per-kind tunnel compiles (the first kind cost ~550 s cold)
    config.enable_compile_cache()

    n_rows = 1 << 20
    nnz = 3_300_000  # mean ~3.1/row, power-law row skew (the stream
    # planner reaches ~60M nnz via the 3-pass shuffle; this size keeps
    # plan build + bench wall-clock short)
    A = power_law_csr(n_rows, n_rows, nnz, alpha=1.5, seed=42)
    x = np.random.default_rng(0).standard_normal(n_rows).astype(np.float32)

    import time

    t0 = time.perf_counter()
    best = None
    for kind in ALL_KINDS:
        if best is not None and time.perf_counter() - t0 > TIME_BUDGET_S:
            print(f"bench budget exceeded, skipping from {kind}",
                  file=sys.stderr)
            break
        try:
            r = benchmark_spmv(kind, A, x, iters=30, check=True)
        except Exception as e:
            print(f"bench {kind} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        print(r.row(), file=sys.stderr)
        if r.delta and r.delta["max_rel"] > 1e-3:
            print(f"bench {kind}: correctness delta too large, skipping",
                  file=sys.stderr)
            continue
        if best is None or r.gnnz_per_s > best.gnnz_per_s:
            best = r

    if best is None:
        print(json.dumps({"metric": "spmv_gnnz_per_s", "value": 0.0,
                          "unit": "Gnnz/s", "vs_baseline": 0.0}))
        return

    model = speed_of_light(A.nnz, A.n_rows)
    sol = model.sol_nnz_per_s(A.mean_nnz_per_row) / 1e9
    target = 0.8 * sol
    print(json.dumps({
        "metric": "spmv_gnnz_per_s",
        "value": round(best.gnnz_per_s, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(best.gnnz_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
