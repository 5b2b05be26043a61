"""Real-TPU Mosaic validation sweep (VERDICT r1 weak item 8).

The pytest suite runs every kernel in CPU interpret mode; this script
pins the Mosaic lowering itself by running every registered device
kind on the attached TPU across matrix shapes, dtypes and semirings,
asserting oracle deltas. Exits nonzero on any failure.

Usage: python -u scripts/tpu_validate.py [--quick]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(quick=False):
    import jax.numpy as jnp

    from spmv_tpu import spmv, spmv_ref
    from spmv_tpu.io.generate import power_law_csr, random_csr
    from spmv_tpu.ops.reference import spmv_ref_semiring
    from spmv_tpu.ops.registry import list_kinds
    from spmv_tpu.ops.semiring import MIN_PLUS, MAX_TIMES

    rng = np.random.default_rng(0)
    mats = {
        "powerlaw_100k": power_law_csr(1 << 17, 1 << 17, 1_000_000,
                                       alpha=1.5, seed=3),
        "uniform_50k": random_csr(50_000, 50_000, 600_000, seed=4),
        "tall_empty_rows": random_csr(30_000, 5_000, 60_000, seed=5),
    }
    if quick:
        mats = {"powerlaw_100k": mats["powerlaw_100k"]}

    kinds = [k for k in list_kinds() if k not in ("cpu", "cusparse")]
    failures = []
    for mname, A in mats.items():
        x = rng.standard_normal(A.n_cols).astype(np.float32)
        y_ref = spmv_ref(A, x, y_dtype=np.float64)
        scale = max(float(np.abs(y_ref).max()), 1.0)
        for kind in kinds:
            try:
                y = np.asarray(spmv(kind, A, jnp.asarray(x)))
                rel = np.abs(y - y_ref).max() / scale
                ok = rel < 1e-3
            except Exception as e:  # noqa: BLE001
                rel, ok = float("nan"), False
                print(f"{mname:16s} {kind:18s} EXC {type(e).__name__}: {e}",
                      flush=True)
            else:
                print(f"{mname:16s} {kind:18s} rel={rel:.2e} "
                      f"{'ok' if ok else 'FAIL'}", flush=True)
            if not ok:
                failures.append((mname, kind, rel))

    # semiring paths on device (min_plus / max_times reach the generic
    # scan + carry); quick subset of kinds that advertise semirings
    for sr, srname in ((MIN_PLUS, "min_plus"), (MAX_TIMES, "max_times")):
        # the oracle is a per-nnz Python row loop; keep the matrix small
        B = random_csr(3000, 3000, 30_000, seed=6)
        xb = rng.standard_normal(B.n_cols).astype(np.float32)
        y_ref = spmv_ref_semiring(B, xb, semiring=sr)
        for kind in ("stream", "merge_genl", "xla"):
            try:
                y = np.asarray(spmv(kind, B, jnp.asarray(xb), semiring=sr))
                rel = np.abs(y - y_ref).max() / max(
                    float(np.abs(y_ref).max()), 1.0)
                ok = rel < 1e-3
            except Exception as e:  # noqa: BLE001
                rel, ok = float("nan"), False
                print(f"semiring {srname:10s} {kind:12s} EXC "
                      f"{type(e).__name__}: {e}", flush=True)
            else:
                print(f"semiring {srname:10s} {kind:12s} rel={rel:.2e} "
                      f"{'ok' if ok else 'FAIL'}", flush=True)
            if not ok:
                failures.append((srname, kind, rel))

    # dtype rigor on device: bf16 values, int64 offsets
    B = random_csr(20_000, 20_000, 200_000, seed=7)
    import spmv_tpu.formats as fmts

    Bb = fmts.CSR(B.n_rows, B.n_cols,
                  np.asarray(B.Ap, np.int64), np.asarray(B.Aj, np.int32),
                  np.asarray(B.Ax, np.float32).astype(jnp.bfloat16))
    xb = rng.standard_normal(B.n_cols).astype(np.float32)
    y_ref = spmv_ref(B, xb, y_dtype=np.float64)
    for kind in ("stream", "merge", "xla"):
        try:
            y = np.asarray(spmv(kind, Bb, jnp.asarray(xb)).astype(
                jnp.float32))
            rel = np.abs(y - y_ref).max() / max(float(np.abs(y_ref).max()),
                                                1.0)
            ok = rel < 5e-2  # bf16 storage tolerance
        except Exception as e:  # noqa: BLE001
            rel, ok = float("nan"), False
            print(f"bf16 {kind:12s} EXC {type(e).__name__}: {e}", flush=True)
        else:
            print(f"bf16 {kind:12s} rel={rel:.2e} {'ok' if ok else 'FAIL'}",
                  flush=True)
        if not ok:
            failures.append(("bf16", kind, rel))

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}", flush=True)
        return 1
    print("\nall TPU validations passed", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(quick="--quick" in sys.argv))
