"""Driver benchmark: one JSON line.

Metric: merge-path SpMV throughput (Gnnz/s) on a power-law synthetic
matrix (the load-imbalance regime the merge kernel targets,
BASELINE.json config 3), on the attached TPU chip.
vs_baseline: achieved fraction of the 80%-of-speed-of-light target
(BASELINE.md): 1.0 means the north-star target is met exactly.

The final line also carries a `kinds` map with every zoo kind timed
this run (Gnnz/s), matching the reference CLI's run-every-named-kind
contract (ref: main.cu:84-113); the same detail is checkpointed to
BENCH_DETAIL.json after every kind so a hard kill loses nothing.
"""

import json
import os
import signal
import sys
import time

import numpy as np

# Every registered device kind gets a TPU number on record
# (VERDICT r1 weak item 3; r4 item 7 adds the remaining ELL variants —
# the full zoo, ref main.cu:102-113); "stream" first so the headline
# metric is available even if a later kind fails, fast kinds before
# the direct ELL/tiled fallbacks so a budget cut trims the slow tail
# first. `dia` runs in its own banded-matrix epoch (it needs regular
# diagonal structure; see dia_epoch).
ALL_KINDS = ("stream", "merge", "merge_genl", "light_vec", "light_warp",
             "csr_vector_shfl", "csr_vector_shfl2", "merge_stock",
             "csr_vector",
             "merge_tiled", "csr_vector_ell", "light_vec_ell",
             "light_warp_ell", "csr_vector_shfl_ell",
             "csr_vector_shfl2_ell", "csr_scalar", "xla")
TIME_BUDGET_S = 2400  # zoo budget; extra epochs get EXTRA_BUDGET_S
EXTRA_BUDGET_S = 900  # dia + wide-row + plan-build section
DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json")


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


def emit(value: float, vs_baseline: float, kinds: dict, extra: dict = None):
    rec = {"metric": "spmv_gnnz_per_s",
           "value": round(value, 3),
           "unit": "Gnnz/s",
           "vs_baseline": round(vs_baseline, 4),
           "kinds": {k: round(v, 3) for k, v in kinds.items()}}
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def main():
    if not probe_devices():
        print("device backend unreachable (tunnel down?); emitting zero",
              file=sys.stderr)
        emit(0.0, 0.0, {})
        return

    from spmv_tpu import config
    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.ops import tuning
    from spmv_tpu.utils.roofline import speed_of_light
    from spmv_tpu.utils.timing import benchmark_spmv

    # stream plans for the bench matrix are pre-built into the disk
    # cache (scripts/prebuild_plans.py); a cold cache just rebuilds
    config.set_plan_dir(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scratch", "plans"))
    # persistent XLA compile cache: repeat runs skip the minutes of
    # per-kind tunnel compiles (the first kind cost ~550 s cold)
    config.enable_compile_cache()
    tuning.load_table(tuning.default_table_path())

    n_rows = 1 << 20
    nnz = 3_300_000  # mean ~3.1/row, power-law row skew (the stream
    # planner reaches ~240M nnz via the 4-pass shuffle; this size keeps
    # plan build + bench wall-clock short)
    A = power_law_csr(n_rows, n_rows, nnz, alpha=1.5, seed=42)
    x = np.random.default_rng(0).standard_normal(n_rows).astype(np.float32)

    model = speed_of_light(A.nnz, A.n_rows)
    sol = model.sol_nnz_per_s(A.mean_nnz_per_row) / 1e9
    target = 0.8 * sol

    t0 = time.perf_counter()
    best = 0.0
    kinds_done: dict = {}

    def _flush_partial():
        try:
            with open(DETAIL_PATH, "w") as f:
                json.dump({"matrix": {"n_rows": n_rows, "nnz": A.nnz,
                                      "kind": "powerlaw", "alpha": 1.5,
                                      "seed": 42},
                           "target_gnnz_per_s": round(target, 3),
                           "kinds": kinds_done}, f, indent=1)
        except OSError:
            pass

    def _sigterm(signum, frame):  # emit best-so-far on a soft kill
        emit(best, best / target if target else 0.0,
             {k: v["gnnz_per_s"] for k, v in kinds_done.items()})
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _sigterm)

    for i, kind in enumerate(ALL_KINDS):
        if best and time.perf_counter() - t0 > TIME_BUDGET_S:
            print(f"bench budget exceeded, skipping from {kind}",
                  file=sys.stderr)
            break
        # fewer iterations for the tail: the slow fallbacks only need a
        # recorded order-of-magnitude, not a tight slope
        iters = 30 if i < 3 else (15 if i < 9 else 8)
        try:
            r = benchmark_spmv(kind, A, x, iters=iters, check=True)
        except Exception as e:
            print(f"bench {kind} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            kinds_done[kind] = {"gnnz_per_s": 0.0,
                                "error": f"{type(e).__name__}: {e}"}
            _flush_partial()
            continue
        print(r.row(), file=sys.stderr)
        ok = not (r.delta and r.delta["max_rel"] > 1e-3)
        kinds_done[kind] = {
            "gnnz_per_s": round(r.gnnz_per_s, 3) if ok else 0.0,
            "kernel_ms": round(r.kernel_s * 1e3, 4),
            "sol_pct": round(100 * (r.sol_fraction or 0), 1),
            "delta_max_rel": (float(r.delta["max_rel"])
                              if r.delta else None),
        }
        _flush_partial()
        if not ok:
            print(f"bench {kind}: correctness delta too large, zeroing",
                  file=sys.stderr)
            continue
        best = max(best, r.gnnz_per_s)

    extra: dict = {}

    # The pooled TPU's load varies ±2x across process epochs (VERDICT
    # r4 item 8): the HEADLINE is the median of >=3 samples of the
    # fastest kind, with the spread carried in the artifact so rounds
    # stop whipsawing on pool noise.
    samples = []
    top = max((k for k in kinds_done if "error" not in kinds_done[k]),
              key=lambda k: kinds_done[k]["gnnz_per_s"], default=None)
    if top:
        samples.append(kinds_done[top]["gnnz_per_s"])
        # 4 extra samples (5 total): measured pool spread reaches ~0.7
        # of the median within one run, and a 3-sample median still
        # moved ±40% between epochs; each warm resample costs ~10 s
        for _ in range(4):
            if time.perf_counter() - t0 > TIME_BUDGET_S + EXTRA_BUDGET_S:
                break
            try:
                r = benchmark_spmv(top, A, x, iters=30, check=False)
                print(f"resample {top}: {r.gnnz_per_s:.2f} Gnnz/s",
                      file=sys.stderr)
                samples.append(r.gnnz_per_s)
            except Exception as e:
                print(f"resample failed: {e}", file=sys.stderr)
        med = float(np.median(samples))
        kinds_done[top]["gnnz_per_s"] = round(max(samples), 3)
        # the HEADLINE value is the median of the fastest kind — not
        # the max over single-pass epochs (the ±2x pool noise made
        # rounds whipsaw when a lucky single sample set the number)
        best = med
        extra["headline"] = {
            "kind": top,
            "median": round(med, 3),
            "samples": [round(s, 3) for s in samples],
            "spread": round((max(samples) - min(samples))
                            / max(med, 1e-9), 3),
        }
        _flush_partial()

    # --- extra epochs: dia (banded matrix), wide-row power-law, and
    # plan-build throughput (VERDICT r4 items 1, 7, 9) ---
    deadline = t0 + TIME_BUDGET_S + EXTRA_BUDGET_S
    try:
        if time.perf_counter() < deadline:
            extra["dia_banded"] = dia_epoch()
            _flush_partial()
    except Exception as e:
        print(f"dia epoch failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        if time.perf_counter() < deadline:
            extra["wide_row"] = wide_row_epoch()
            _flush_partial()
    except Exception as e:
        print(f"wide-row epoch failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        extra["plan_build"] = plan_build_stat(A)
    except Exception as e:
        print(f"plan-build stat failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    def _flush_extra():
        try:
            with open(DETAIL_PATH) as f:
                d = json.load(f)
            d.update(extra)
            with open(DETAIL_PATH, "w") as f:
                json.dump(d, f, indent=1)
        except OSError:
            pass

    _flush_extra()
    emit(best, best / target if target else 0.0,
         {k: v["gnnz_per_s"] for k, v in kinds_done.items()}, extra)


def dia_epoch() -> dict:
    """`dia` needs regular diagonal structure: time it (and the CSR
    csr_vector on the same matrix for scale) on a banded mean-10
    matrix, so the repo's best number is driver-captured
    (VERDICT r4 item 7: dia lived only in docs/BASELINE_ROWS.md)."""
    from spmv_tpu.io.generate import banded_csr
    from spmv_tpu.utils.roofline import speed_of_light
    from spmv_tpu.utils.timing import benchmark_spmv

    n = 1 << 20
    A = banded_csr(n, bandwidth=5, seed=3)  # ~11 nnz/row
    x = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    model = speed_of_light(A.nnz, A.n_rows)
    sol = model.sol_nnz_per_s(A.mean_nnz_per_row) / 1e9
    out = {"matrix": {"kind": "banded", "n": n, "bandwidth": 5,
                      "nnz": A.nnz},
           "sol_gnnz_per_s": round(sol, 3), "kinds": {}}
    for kind in ("dia", "csr_vector"):
        r = benchmark_spmv(kind, A, x, iters=20, check=True)
        print(r.row(), file=sys.stderr)
        ok = not (r.delta and r.delta["max_rel"] > 1e-3)
        out["kinds"][kind] = {
            "gnnz_per_s": round(r.gnnz_per_s, 3) if ok else 0.0,
            "sol_pct": round(100 * (r.sol_fraction or 0), 1)}
    return out


def wide_row_epoch() -> dict:
    """Mean-16 power-law config (VERDICT r4 item 1's alternative bar):
    row terms amortize, so the stream pipeline's per-partial tax is
    paid over ~5x more nnz. Reported with its own SoL model."""
    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.utils.roofline import speed_of_light
    from spmv_tpu.utils.timing import benchmark_spmv

    n = 1 << 20
    nnz = 16 * n
    A = power_law_csr(n, n, nnz, alpha=1.5, seed=7)
    x = np.random.default_rng(2).standard_normal(n).astype(np.float32)
    model = speed_of_light(A.nnz, A.n_rows)
    sol = model.sol_nnz_per_s(A.mean_nnz_per_row) / 1e9
    out = {"matrix": {"kind": "powerlaw", "n": n, "nnz": A.nnz,
                      "alpha": 1.5, "mean_row": round(A.mean_nnz_per_row, 2)},
           "sol_gnnz_per_s": round(sol, 3),
           "target_gnnz_per_s": round(0.8 * sol, 3), "kinds": {}}
    best = 0.0
    for kind in ("stream", "csr_vector_shfl"):
        r = benchmark_spmv(kind, A, x, iters=20, check=True)
        print(r.row(), file=sys.stderr)
        ok = not (r.delta and r.delta["max_rel"] > 1e-3)
        g = r.gnnz_per_s if ok else 0.0
        out["kinds"][kind] = {
            "gnnz_per_s": round(g, 3),
            "sol_pct": round(100 * (r.sol_fraction or 0), 1)}
        best = max(best, g)
    out["vs_baseline"] = round(best / (0.8 * sol), 4) if sol else 0.0
    return out


def plan_build_stat(A) -> dict:
    """Plan-construction throughput (VERDICT r4 item 9): wall time of
    a COLD stream plan build for the bench matrix (disk cache
    bypassed), reported as nnz/s of host planning."""
    from spmv_tpu.kernels.stream import build_stream_plan, StreamPolicy
    from spmv_tpu.ops import tuning

    pol = StreamPolicy(kappa=12288, **tuning.dispatch_fields())
    t0 = time.perf_counter()
    build_stream_plan(A, pol)
    el = time.perf_counter() - t0
    return {"nnz": A.nnz, "seconds": round(el, 2),
            "mnnz_per_s": round(A.nnz / el / 1e6, 2)}


if __name__ == "__main__":
    main()
