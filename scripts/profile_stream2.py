"""Per-pass profile of the stream-SpMV pipeline (round 4).

Times each stage with the device-chained slope loop from
utils/timing.py — the ONLY honest method on the tunneled runtime:
async dispatch + block_until_ready does not reflect device completion
there (identical dispatches dedupe and "waited" pipelines report
>HBM-bandwidth throughputs; measured 2026-08-20).

Run ON TPU:  python scripts/profile_stream2.py [nnz] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu import config

config.set_plan_dir(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scratch", "plans"))
config.enable_compile_cache()

from spmv_tpu.io.generate import power_law_csr
from spmv_tpu.kernels import stream
from spmv_tpu.ops.semiring import PLUS_TIMES
from spmv_tpu.ops.tuning import policy_for, load_table, default_table_path

LANES = 128


def time_stage(fn, x0, iters=40):
    """Device-chained slope timing (see utils/timing.benchmark_fn)."""
    from spmv_tpu.utils.timing import benchmark_fn

    _, kern = benchmark_fn(fn, x0, iters=iters)
    return kern


def main(nnz=3_300_000, iters=40):
    n_rows = 1 << 20
    A = power_law_csr(n_rows, n_rows, nnz, alpha=1.5, seed=42)
    x = np.random.default_rng(0).standard_normal(n_rows).astype(np.float32)
    load_table(default_table_path())
    pol = policy_for(4)
    print(f"matrix: {n_rows} rows nnz={A.nnz}; policy {pol}", flush=True)

    from spmv_tpu.utils.plancache import stream_plan_cached

    plan = stream_plan_cached(A, pol, config.plan_dir())
    print(f"plan: gather_tiles={plan.n_gather_tiles} "
          f"final_tiles={plan.n_final_tiles} "
          f"passes={[(p.n_steps, p.K, p.Q) for p in plan.shuffle.passes]}",
          flush=True)
    interp = config.use_interpret()
    sr = PLUS_TIMES

    xp = jnp.pad(x, (0, plan.x_rows_pad * LANES - A.n_cols))
    x2d = jnp.swapaxes(xp.reshape(-1, LANES, LANES), 1, 2).reshape(-1, LANES)
    n_aug = int(np.asarray(plan.hot_cols).shape[0])
    if n_aug:
        hot_x = jnp.take(jnp.asarray(x), jnp.asarray(plan.hot_cols))
        aug = jnp.broadcast_to(
            hot_x.reshape(-1, 1, LANES),
            (n_aug // LANES, LANES, LANES)).reshape(-1, LANES)
        x2d = jnp.concatenate([x2d, aug], axis=0)
    x2d = jax.device_put(x2d)

    ax, q, xb = plan.gather["Ax"], plan.gather["q"], plan.gather["xb"]

    def rep(label, fn, x0, gb=None):
        k = time_stage(fn, x0, iters=iters)
        bwtxt = f"  {gb/k:7.1f} GB/s" if gb else ""
        print(f"{label:28s} {k*1e3:8.4f} ms{bwtxt}", flush=True)
        return k

    stages = 0.0
    if plan.reduce is not None:
        rd = plan.reduce
        gb = (plan.n_gather_tiles * 16384 * 12.5
              + plan.n_gather_tiles * rd["Qp"] * 128 * 4) / 1e9

        def run_reduce(v):
            return stream._reduce_pass(
                v, ax, q, xb, rd["c1"], rd["c2"], rd["c3"],
                sr=sr, sbt=8, n_tiles=plan.n_gather_tiles,
                Qp=rd["Qp"], out_rows=rd["out_rows"], interpret=interp)

        stages += rep(f"reduce (Qp={rd['Qp']})", run_reduce, x2d, gb)
        cur = run_reduce(x2d)
    else:
        def run_gather(v):
            return stream._gather_pass(
                v, ax, q, xb, sr=sr, sbt=8,
                n_tiles=plan.n_gather_tiles, interpret=interp)

        stages += rep("gather", run_gather, x2d)
        cur = run_gather(x2d)

    from spmv_tpu.kernels.shuffle import _run_split

    for i, (p, d) in enumerate(zip(plan.shuffle.passes, plan.shuffle_dev)):
        def run_split(v, p=p, d=d):
            return _run_split(
                v, d["s1"], d["s2"], d["s3"], d["starts"], d["pos"],
                n_steps=p.n_steps, sbt=p.sbt, K=p.K, Q=p.Q,
                rows_per_g=p.out_rows // p.K, interpret=interp)

        gb = (2 * cur.size * 4 + d["s1"].size * 3) / 1e9
        stages += rep(f"split{i} (K={p.K},Q={p.Q},steps={p.n_steps})",
                      run_split, cur, gb)
        cur = run_split(cur).reshape(p.out_rows, LANES)

    s = plan.scan
    F_pad = s["relid"].shape[0] // LANES
    prod_fin = cur
    if prod_fin.shape[0] < F_pad * LANES:
        prod_fin = jnp.pad(
            prod_fin, ((0, F_pad * LANES - prod_fin.shape[0]), (0, 0)))

    def run_scan(v):
        return stream._scan_pass(
            v, s["relid"], s["pm1"], s["pm2"], s["pm3"],
            s["r2s1"], s["r2s2"], s["r2s3"],
            s["q2s1"], s["q2s2"], s["q2s3"], s["valid2"], s["counts"],
            sr=sr, F_pad=F_pad,
            strategy=pol.scan_strategy, sbt=pol.scan_sbt,
            interpret=interp)

    gb = (F_pad * 16384 * 14.0 + F_pad * 16384 * 4) / 1e9
    stages += rep(f"scan (sbt={pol.scan_sbt})", run_scan, prod_fin, gb)
    ycand = run_scan(prod_fin)

    pieces = tuple(zip(
        (int(v) for v in np.asarray(s["m_kind"])),
        (int(v) for v in np.asarray(s["m_a"])),
        (int(v) for v in np.asarray(s["m_len"]))))
    n_fix, fx = 0, []
    while f"fx{n_fix}_out" in s:
        fx += [s[f"fx{n_fix}_out"], s[f"fx{n_fix}_src"]]
        n_fix += 1

    def run_merge(v):
        return stream._merge_pieces(v, *fx, sr=sr, pieces=pieces,
                                    n_fix=n_fix)

    gb = 2 * plan.n_y_blocks * 128 * 4 / 1e9
    stages += rep("merge", run_merge, ycand, gb)

    xj = jnp.asarray(x)
    stages_known = stages

    def run_e2e(v):
        return stream._stream_spmv(A, v, sr, pol)

    t = rep("END-TO-END", run_e2e, xj)
    print(f"sum of stages: {stages_known*1e3:.4f} ms; "
          f"e2e {A.nnz/t/1e9:.2f} Gnnz/s", flush=True)
    aud = stream.audit_plan(plan, A.nnz)
    for k, v in aud["per_pass_bytes_per_nnz"].items():
        print(f"  {k:8s} {v:6.2f} B/nnz", flush=True)
    print(f"  total    {aud['bytes_per_nnz']:6.2f} B/nnz  floor@636: "
          f"{aud['total_bytes']/636e9*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    nnz = int(sys.argv[1]) if len(sys.argv) > 1 else 3_300_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    main(nnz, iters)
