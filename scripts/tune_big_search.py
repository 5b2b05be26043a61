"""Offline 4-pass geometry search tuning: builds (or loads cached)
stream-plan inputs for a big matrix and runs ONLY the kappa-sweep +
plan_shuffle_auto with verbose logging and timing. CPU-only.

Usage: python scripts/tune_big_search.py [nnz] [rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPMV_TPU_PLAN_VERBOSE", "1")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main(nnz=100_000_000, n_rows=8 << 20):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from spmv_tpu.kernels.stream import (
        StreamPolicy, _final_tile_walk, _plan_gather, TILE,
    )
    from spmv_tpu.kernels.pallas_utils import LANES

    cache = f"/tmp/bigsearch2_{nnz}_{n_rows}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        slot_src, Ap = z["slot_src"], z["Ap"]
        print(f"loaded cached inputs: slots={slot_src.shape[0]}",
              flush=True)
    else:
        from spmv_tpu.io.generate import power_law_csr

        t0 = time.perf_counter()
        A = power_law_csr(n_rows, n_rows, nnz, alpha=1.5, seed=11)
        print(f"matrix: {time.perf_counter()-t0:.0f}s", flush=True)
        Ap = np.asarray(A.Ap, np.int64)
        Aj = np.asarray(A.Aj, np.int64)
        pol = StreamPolicy()
        x_blocks_pad = -(-A.n_cols // (LANES * LANES))
        t0 = time.perf_counter()
        slot_src, slot_q, xb, hot = _plan_gather(Aj, pol, x_blocks_pad)
        print(f"plan_gather: {time.perf_counter()-t0:.0f}s "
              f"tiles={xb.shape[0]}", flush=True)
        pad_tiles = max(128, -(-xb.shape[0] // 128) * 128)
        padn = pad_tiles - xb.shape[0]
        if padn:
            slot_src = np.concatenate(
                [slot_src, np.full(padn * TILE, -1, np.int64)])
        np.savez(cache, slot_src=slot_src, Ap=Ap)

    from spmv_tpu.kernels.shuffle import plan_shuffle_auto

    row_ids = np.repeat(np.arange(Ap.shape[0] - 1, dtype=np.int64),
                        Ap[1:] - Ap[:-1])
    live = slot_src >= 0
    for kappa in (14336, 12288, 10240, 8192):
        t0 = time.perf_counter()
        k_starts, bins, r_starts, lrows = _final_tile_walk(
            Ap, row_ids, kappa)
        F = k_starts.shape[0] - 1
        ftile = np.searchsorted(k_starts, np.arange(nnz),
                                side="right") - 1
        dst_of_rank = ftile * TILE + (np.arange(nnz) - k_starts[ftile])
        dst_pos = np.full(slot_src.shape[0], -1, dtype=np.int64)
        dst_pos[live] = dst_of_rank[slot_src[live]]
        print(f"kappa={kappa}: F={F} "
              f"(walk {time.perf_counter()-t0:.0f}s)", flush=True)

        t0 = time.perf_counter()

        def log(m, t0=t0):
            print(f"[{time.perf_counter()-t0:7.1f}s] {m}", flush=True)

        try:
            plan = plan_shuffle_auto(dst_pos, F, sbt=8, log=log)
            print(f"PLANNED at kappa={kappa} in "
                  f"{time.perf_counter()-t0:.0f}s: "
                  f"{[(p.n_steps, p.K, p.Q) for p in plan.passes]}",
                  flush=True)
            return
        except ValueError as e:
            print(f"kappa={kappa} FAILED in "
                  f"{time.perf_counter()-t0:.0f}s: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    nnz = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8 << 20
    main(nnz, rows)
