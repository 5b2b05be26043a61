"""Probe the attached TPU: chip kind, achievable HBM bandwidth, and the
relative cost of the primitives an SpMV design can be built from.

Run:  python scripts/tpu_probe.py [--nnz 16777216]

All timings chain `iters` evaluations on-device inside one dispatch
with a real data dependency (see spmv_tpu/utils/timing.py for why:
remote runtimes coalesce identical dispatches, so naive loops lie).

Effective GB/s is computed over the bytes each primitive semantically
must move, so numbers are comparable to the chip's HBM roofline:

  stream     : y = a + b elementwise               (3 moves/elem)
  take_rand  : jnp.take(x, idx), random idx        (XLA gather path)
  take_sorted: jnp.take(x, idx), sorted idx
  segsum     : segment_sum(v, rows, sorted)        (XLA scatter path)
  pallas_strm: same as stream via pallas           (launch sanity)
  pallas_lgath: take_along_axis over 128 lanes inside pallas
  onehot     : gather from 512-entry table via MXU one-hot matmul
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def chain_time(fn, x0, iters=20):
    """Time fn with device-chained iterations; fn maps array->array of
    the same shape/dtype-compatible first element."""

    def body(_, carry):
        x, acc = carry
        y = fn(x)
        acc = acc + y.reshape(-1)[0].astype(jnp.float32)
        taint = jnp.where(jnp.isnan(acc), y.reshape(-1)[0].astype(x.dtype),
                          jnp.zeros((), x.dtype))
        x = x.at[0].add(taint)
        return x, acc

    @jax.jit
    def run(x):
        x, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc + x.reshape(-1)[0].astype(jnp.float32)

    float(run(x0))  # compile + warm
    t0 = time.perf_counter()
    s = float(run(x0))
    el = time.perf_counter() - t0
    assert np.isfinite(s)
    return el / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nnz", type=int, default=1 << 24)
    p.add_argument("--ncols", type=int, default=1 << 21)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    n, c, iters = args.nnz, args.ncols, args.iters

    d = jax.devices()[0]
    print(f"device: {d.device_kind} platform={d.platform} jax={jax.__version__}")

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    idx_r = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    idx_s = jnp.asarray(np.sort(rng.integers(0, c, n).astype(np.int32)))
    rows = jnp.asarray(np.sort(rng.integers(0, n // 8, n).astype(np.int32)))

    t = chain_time(lambda v: v + a, a, iters)
    print(f"stream      : {t*1e3:8.3f} ms  {3*4*n/t/1e9:8.1f} GB/s")

    t = chain_time(lambda v: jnp.take(v, idx_r), x, iters)
    print(f"take_rand   : {t*1e3:8.3f} ms  {8*n/t/1e9:8.1f} GB/s  ({n/t/1e9:.2f} G/s)")
    t = chain_time(lambda v: jnp.take(v, idx_s), x, iters)
    print(f"take_sorted : {t*1e3:8.3f} ms  {8*n/t/1e9:8.1f} GB/s  ({n/t/1e9:.2f} G/s)")

    t = chain_time(
        lambda v: jax.ops.segment_sum(v, rows, num_segments=n // 8,
                                      indices_are_sorted=True),
        a, iters)
    print(f"segsum      : {t*1e3:8.3f} ms  {8*n/t/1e9:8.1f} GB/s  ({n/t/1e9:.2f} G/s)")

    # --- pallas stream ---
    def pk(a_ref, b_ref, o_ref):
        o_ref[...] = a_ref[...] + b_ref[...]

    S = 512
    m = n // (S * 128)
    a2 = a.reshape(m * S, 128)

    def pallas_stream(v):
        return pl.pallas_call(
            pk,
            grid=(m,),
            in_specs=[pl.BlockSpec((S, 128), lambda i: (i, 0)),
                      pl.BlockSpec((S, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((S, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m * S, 128), jnp.float32),
        )(v, a2)

    t = chain_time(pallas_stream, a2, iters)
    print(f"pallas_strm : {t*1e3:8.3f} ms  {3*4*n/t/1e9:8.1f} GB/s")

    # --- pallas lane gather ---
    def gk(tab_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(tab_ref[...], idx_ref[...], axis=1)

    lidx = jnp.asarray(rng.integers(0, 128, (m * S, 128)).astype(np.int32))

    def pallas_lane_gather(v):
        return pl.pallas_call(
            gk,
            grid=(m,),
            in_specs=[pl.BlockSpec((S, 128), lambda i: (i, 0)),
                      pl.BlockSpec((S, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((S, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m * S, 128), jnp.float32),
        )(v, lidx)

    try:
        t = chain_time(pallas_lane_gather, a2, iters)
        print(f"pallas_lgath: {t*1e3:8.3f} ms  {12*n/t/1e9:8.1f} GB/s  ({n/t/1e9:.2f} G/s)")
    except Exception as e:
        print(f"pallas_lgath: FAILED {type(e).__name__}: {str(e)[:200]}")

    # --- one-hot matmul gather, 512-entry table ---
    K = 512
    oidx = jnp.asarray(rng.integers(0, K, (n // 128, 128)).astype(np.int32))

    def onehot_gather(v):
        oh = jax.nn.one_hot(oidx, K, dtype=jnp.bfloat16)
        return (oh @ v[:K].astype(jnp.bfloat16)).astype(jnp.float32)

    try:
        t = chain_time(onehot_gather, x, iters)
        print(f"onehot      : {t*1e3:8.3f} ms  ({n/t/1e9:.2f} G gathers/s)")
    except Exception as e:
        print(f"onehot      : FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
