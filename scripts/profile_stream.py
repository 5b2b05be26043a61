"""Per-pass profile of the stream-SpMV pipeline on the bench matrix.

Times each stage (gather / split passes / concats / scan) separately
with the slope method, plus the end-to-end kernel, to locate where the
time actually goes. Run ON TPU: python scripts/profile_stream.py [nnz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu import config
from spmv_tpu.io.generate import power_law_csr
from spmv_tpu.kernels.stream import (
    DEFAULT_POLICY,
    build_stream_plan,
    _gather_pass,
    _scan_pass,
)
from spmv_tpu.kernels.shuffle import _run_split
from spmv_tpu.ops.semiring import PLUS_TIMES
from spmv_tpu.utils.timing import benchmark_fn

LANES = 128


def main(nnz=3_300_000, iters=80):
    n_rows = 1 << 20
    A = power_law_csr(n_rows, n_rows, nnz, alpha=1.5, seed=42)
    x = np.random.default_rng(0).standard_normal(n_rows).astype(np.float32)
    print(f"matrix: {n_rows} rows, nnz={A.nnz}", flush=True)

    from spmv_tpu.ops.registry import plan_cache

    pol = DEFAULT_POLICY
    plan = plan_cache(
        A, ("stream", pol.kappa, pol.hot_threshold, pol.gather_sbt),
        lambda: build_stream_plan(A, pol))
    print(f"plan: gather_tiles={plan.n_gather_tiles} "
          f"final_tiles={plan.n_final_tiles} "
          f"passes={[(p.n_steps, p.K, p.Q) for p in plan.shuffle.passes]}",
          flush=True)

    interp = config.use_interpret()
    sr = PLUS_TIMES

    # --- stage inputs ---
    xp = jnp.pad(x, (0, plan.x_rows_pad * LANES - A.n_cols))
    x2d = jnp.swapaxes(
        xp.reshape(-1, LANES, LANES), 1, 2).reshape(-1, LANES)
    n_aug = int(np.asarray(plan.hot_cols).shape[0])
    if n_aug:
        hot_x = jnp.take(jnp.asarray(x), jnp.asarray(plan.hot_cols))
        aug = jnp.broadcast_to(
            hot_x.reshape(-1, 1, LANES),
            (n_aug // LANES, LANES, LANES)).reshape(-1, LANES)
        x2d = jnp.concatenate([x2d, aug], axis=0)
    x2d = jax.device_put(x2d)

    ax = plan.gather["Ax"]
    q = plan.gather["q"]
    xb = plan.gather["xb"]

    def t(label, fn, x0, gb=None):
        total, kern = benchmark_fn(fn, x0, iters=iters)
        bwtxt = f"  {gb/kern:7.1f} GB/s" if gb else ""
        print(f"{label:28s} {kern*1e3:8.4f} ms{bwtxt}", flush=True)
        return kern

    nbytes = lambda a: a.size * a.dtype.itemsize

    # gather pass
    gb_gather = (nbytes(ax) + nbytes(q) + nbytes(ax)  # out same as ax
                 + plan.n_gather_tiles * LANES * LANES * 4) / 1e9
    if plan.reduce is not None:
        from spmv_tpu.kernels.stream import _reduce_pass

        rd = plan.reduce
        gb_red = (plan.n_gather_tiles * 16384 * (4 + 1 + 4 + 3 + 0.5)
                  + plan.n_gather_tiles * rd["Qp"] * 128 * 4) / 1e9

        def run_reduce(v):
            return _reduce_pass(
                v, ax, q, xb, rd["c1"], rd["c2"], rd["c3"], rd["fm"],
                sr=sr, sbt=8, n_tiles=plan.n_gather_tiles,
                Qp=rd["Qp"], out_rows=rd["out_rows"], interpret=interp)

        t_g = t(f"reduce (Qp={rd['Qp']})", run_reduce, x2d, gb_red)
        prod = run_reduce(x2d)
    else:
        t_g = t("gather", lambda v: _gather_pass(
            v, ax, q, xb, sr=sr, sbt=8, n_tiles=plan.n_gather_tiles,
            interpret=interp), x2d, gb_gather)

        # split passes (input = simulated stage data of right shape)
        prod = _gather_pass(x2d, ax, q, xb, sr=sr, sbt=8,
                            n_tiles=plan.n_gather_tiles, interpret=interp)
    cur = prod
    t_splits = []
    t_concats = []
    for i, (p, d) in enumerate(zip(plan.shuffle.passes, plan.shuffle_dev)):
        def run_split(v, p=p, d=d):
            return _run_split(
                v, d["s1"], d["s2"], d["s3"], d["starts"], d["pos"],
                n_steps=p.n_steps, sbt=p.sbt, K=p.K, Q=p.Q,
                rows_per_g=p.out_rows // p.K, interpret=interp)

        gb_split = (2 * nbytes(cur) + nbytes(d["s1"]) * 3) / 1e9
        t_splits.append(t(f"split{i} (K={p.K},Q={p.Q},"
                          f"steps={p.n_steps})", run_split, cur, gb_split))
        outs = run_split(cur)
        cat = jax.jit(lambda *o: jnp.concatenate(o, axis=0))
        gb_cat = 2 * sum(nbytes(o) for o in outs) / 1e9
        t_concats.append(t(f"concat{i}", lambda v, outs=outs:
                           cat(*outs), outs[0], gb_cat))
        cur = jnp.concatenate(outs, axis=0)

    s = plan.scan
    F_pad = s["cid"].shape[0] // LANES
    prod_fin = cur
    if prod_fin.shape[0] < F_pad * LANES:
        prod_fin = jnp.pad(
            prod_fin, ((0, F_pad * LANES - prod_fin.shape[0]), (0, 0)))
    gb_scan = (F_pad * 16384 * 4
               + sum(nbytes(s[k]) for k in
                     ("cid", "r1s1", "r1s2", "r1s3",
                      "p1s1", "p1s2", "p1s3",
                      "r2s1", "r2s2", "r2s3", "valid2"))
               + F_pad * 8192 * 4) / 1e9
    t_s = t("scan", lambda v: _scan_pass(
        v, s["cid"], s["r1s1"], s["r1s2"], s["r1s3"],
        s["p1s1"], s["p1s2"], s["p1s3"], s["rel2"],
        s["r2s1"], s["r2s2"], s["r2s3"], s["valid2"],
        s["first_idx"], s["cmask"], s["climit"],
        sr=sr, F_pad=F_pad, r1_fused=s["r1_fused"],
        interpret=interp), prod_fin, gb_scan)

    from spmv_tpu.kernels.stream import _bin_merge
    ycand = _scan_pass(
        prod_fin, s["cid"], s["r1s1"], s["r1s2"], s["r1s3"],
        s["p1s1"], s["p1s2"], s["p1s3"], s["rel2"],
        s["r2s1"], s["r2s2"], s["r2s3"], s["valid2"],
        s["first_idx"], s["cmask"], s["climit"],
        sr=sr, F_pad=F_pad, r1_fused=s["r1_fused"], interpret=interp)
    L_m = int(np.asarray(s["merge_idx"]).shape[0])
    nlv = 0
    lv = []
    while f"mlv{nlv}_a" in s:
        lv += [s[f"mlv{nlv}_a"], s[f"mlv{nlv}_b"]]
        nlv += 1
    gb_merge = ((L_m + 1) * plan.n_y_blocks * 128 * 4) / 1e9
    t("merge", lambda v: _bin_merge(v, s["merge_idx"], *lv, sr=sr,
                                    n_levels=nlv),
      ycand, gb_merge)

    # end to end
    from spmv_tpu.kernels.stream import _stream_spmv, audit_plan
    t_e2e = t("END-TO-END", lambda v: _stream_spmv(
        A, v, sr, DEFAULT_POLICY), jnp.asarray(x))
    print(f"nnz/s end-to-end: {A.nnz/t_e2e/1e9:.2f} Gnnz/s", flush=True)
    audit = audit_plan(plan, A.nnz)
    print("bytes/nnz audit:", flush=True)
    for k, v in audit["per_pass_bytes_per_nnz"].items():
        print(f"  {k:8s} {v:6.2f} B/nnz", flush=True)
    print(f"  total    {audit['bytes_per_nnz']:6.2f} B/nnz "
          f"(bandwidth floor at 636 GB/s: "
          f"{audit['total_bytes']/636e9*1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    nnz = int(sys.argv[1]) if len(sys.argv) > 1 else 3_300_000
    main(nnz)
