"""Weak-scaling benchmark for the distributed SpMV layer.

Per-device problem size is held constant while the device count grows;
efficiency(n) = t(n_min) / t(n). Target: >=70% at the largest mesh
(BASELINE.md north star). Runs on any mesh — a real pod slice, or the
simulated CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu), where the numbers validate the mechanism rather
than ICI bandwidth.

Usage:
    python -m spmv_tpu.bench.weak_scaling [--rows-per-dev 65536]
        [--nnz-per-dev 524288] [--devices 1 2 4 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run(n_devices: int, rows_per_dev: int, nnz_per_dev: int,
        iters: int, mode: str = "halo", seed: int = 0,
        impl: str = "stream"):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from spmv_tpu.io.generate import power_law_csr
    from spmv_tpu.ops.registry import PlanCapacityError
    from spmv_tpu.parallel import distribute_csr, distribute_stream

    devs = jax.devices()
    if len(devs) < n_devices:
        return None
    mesh = Mesh(np.array(devs[:n_devices]), ("shards",))
    n = rows_per_dev * n_devices
    A = power_law_csr(n, n, nnz_per_dev * n_devices, alpha=1.5, seed=seed)
    x = np.random.default_rng(seed).standard_normal(n).astype(np.float32)

    dist = None
    if impl == "stream":
        # the per-chip stream-pipeline fast path (round 4); shards too
        # small/sparse for its planner fall back to the ELL path
        try:
            dist = distribute_stream(A, mesh)
            matvec = lambda xv: dist.matvec(xv)
        except PlanCapacityError as e:
            print(f"n={n_devices}: stream infeasible ({e}); ELL path",
                  file=sys.stderr)
    if dist is None:
        dist = distribute_csr(A, mesh)
        matvec = lambda xv: dist.matvec(xv, mode=mode)
    xs = dist.shard_x(x)
    y = matvec(xs)
    jax.block_until_ready(y)  # compile + settle

    def loop(k):
        t0 = time.perf_counter()
        yy = xs
        for _ in range(k):
            yy = matvec(xs)
        jax.block_until_ready(yy)
        return time.perf_counter() - t0

    lo = max(1, iters // 4)
    t = (loop(iters) - loop(lo)) / (iters - lo)
    return {
        "n_devices": n_devices,
        "nnz": A.nnz,
        "time_s": t,
        "gnnz_per_s": A.nnz / t / 1e9,
        "comm_bytes_per_shard": dist.comm_bytes_per_shard,
        "allgather_bytes_per_shard": dist.allgather_bytes_per_shard,
    }


def main(argv=None):
    # The axon sitecustomize forces the tunneled TPU backend in-process;
    # honor an explicit JAX_PLATFORMS=cpu request (the simulated-mesh
    # mode) the way tests/conftest.py does.
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows-per-dev", type=int, default=1 << 16)
    p.add_argument("--nnz-per-dev", type=int, default=1 << 19)
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", choices=["halo", "allgather"], default="halo")
    p.add_argument("--impl", choices=["stream", "ell"], default="stream",
                   help="per-chip compute: the stream-pipeline fast "
                        "path (default) or the ELL path")
    args = p.parse_args(argv)

    results = []
    base = None
    for n in args.devices:
        r = run(n, args.rows_per_dev, args.nnz_per_dev, args.iters,
                mode=args.mode, impl=args.impl)
        if r is None:
            print(f"n={n}: not enough devices, skipping", file=sys.stderr)
            continue
        if base is None:
            base = r["time_s"]
        r["weak_scaling_efficiency"] = base / r["time_s"]
        results.append(r)
        import jax

        simulated = jax.default_backend() == "cpu"
        # On the simulated mesh every "device" shares one host core, so
        # the physical upper bound is eff = 1/n; report the
        # serialization-adjusted number (eff*n) alongside — that is the
        # figure comparable to a real pod's efficiency.
        adj = (f"  (adj {min(r['weak_scaling_efficiency']*r['n_devices'], 9.99)*100:.0f}% "
               f"of 1-core-serialized bound)" if simulated else "")
        print(f"n={r['n_devices']}: {r['time_s']*1e3:.3f} ms/iter  "
              f"{r['gnnz_per_s']:.2f} Gnnz/s  "
              f"eff={r['weak_scaling_efficiency']*100:.0f}%{adj}  "
              f"comm {r['comm_bytes_per_shard']/1e6:.2f} MB vs "
              f"allgather {r['allgather_bytes_per_shard']/1e6:.2f} MB",
              file=sys.stderr)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
