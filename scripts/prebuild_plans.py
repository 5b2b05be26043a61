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


def _valid(path: str) -> bool:
    """Header-only check: current format version + remap metadata."""
    import json

    import numpy as np

    from spmv_tpu.utils import plancache as pc

    try:
        z = np.load(path)
        sc = json.loads(bytes(z["__header__"]).decode())
        if sc.get("version") != pc._FORMAT_VERSION:
            return False
        if "gather.xr1" in z.files and (
                "gather.g0" not in z.files
                or "gather.x_nat_rows" not in sc):
            return False
        return True
    except Exception:
        return False


def prebuild(nnz: int, rows: int, seed: int, alpha: float = 1.5,
             kappas=None):
    """Build the stream plan(s) for one synthetic matrix.

    The bench (bench.py) times every registered kind; the stream-
    pipeline kinds resolve to distinct structural kappas (stream /
    csr_vector* -> the chip table, merge/merge_genl 14336,
    merge_stock 8192, light_* -> skew tables light.py:46-48), so warm
    the cache for each of them — one cold plan build per kappa
    otherwise lands inside the driver's bench window.
    """
    import dataclasses

    import numpy as np

    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.kernels import stream as st
    from spmv_tpu.kernels import light
    from spmv_tpu.ops.tuning import policy_for
    from spmv_tpu.utils.plancache import plan_key, save_plan

    A = power_law_csr(rows, rows, nnz, alpha=alpha, seed=seed)
    if kappas is None:
        kappas = {policy_for(4, chip="v5e").kappa, 14336, 8192,
                  light._kappa_for(A, light.FINE_KAPPA),
                  light._kappa_for(A, light.COARSE_KAPPA),
                  12288}  # csr_vector family (csr_vector.py:72)
    for kappa in sorted(kappas):
        t0 = time.perf_counter()
        pol = dataclasses.replace(st.DEFAULT_POLICY, kappa=kappa)
        key = plan_key(A, pol)
        path = os.path.join("scratch/plans", f"stream-{key}.npz")
        if os.path.exists(path) and _valid(path):
            print(f"nnz={nnz} kappa={kappa}: cached ({path})", flush=True)
            continue
        plan = st.build_stream_plan(A, pol)
        save_plan(plan, path)
        print(f"nnz={nnz} kappa={kappa}: built+saved in "
              f"{time.perf_counter()-t0:.0f}s -> {path} "
              f"({os.path.getsize(path)/1e6:.0f} MB)", flush=True)


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
