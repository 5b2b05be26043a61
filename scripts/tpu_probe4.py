"""Probe 4: Pallas block-revisit behavior for (t, k) grids.

Question: with grid (T, K) and an input BlockSpec whose index map
ignores k, does Mosaic re-fetch the block on every inner step (cost
x K) or only when the block index changes (cost x 1)?

This gates the stream-v2 split-kernel design: one (n_steps, K) grid
writing one output block per inner step, with data/routing inputs
fetched once per outer step.

Run ON TPU:  python scripts/tpu_probe4.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def probe_revisit(T=64, K=8, rows_blk=1024):
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((T * rows_blk, LANES)),
        dtype=jnp.float32)

    def kernel(in_ref, out_ref):
        # tiny out write per (t, k); input indexed by t only
        out_ref[...] = in_ref[0:8, :] * 2.0

    def build(Kv):
        return pl.pallas_call(
            kernel,
            grid=(T, Kv),
            in_specs=[pl.BlockSpec((rows_blk, LANES), lambda t, k: (t, 0))],
            out_specs=pl.BlockSpec((8, LANES), lambda t, k: (t * Kv + k, 0)),
            out_shape=jax.ShapeDtypeStruct((T * Kv * 8, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )

    from spmv_tpu.utils.timing import benchmark_fn

    for Kv in (1, K):
        f = build(Kv)
        total, kern = benchmark_fn(lambda d: f(d), data, iters=40)
        gb = T * rows_blk * LANES * 4 / 1e9
        print(f"K={Kv}: kernel {kern*1e3:.3f} ms  "
              f"({gb/kern:.1f} GB/s on 1x-read model)")


def probe_write_pattern(T=64, K=8, rows_blk=1024):
    """Full split-like config: read one block per t, write K quota
    windows of rows_blk/K rows each per t (one per inner step)."""
    data = jnp.asarray(
        np.random.default_rng(0).standard_normal((T * rows_blk, LANES)),
        dtype=jnp.float32)
    q = rows_blk // K

    def kernel(in_ref, out_ref, scratch):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            scratch[...] = in_ref[...] * 2.0

        out_ref[0] = scratch[pl.ds(k * q, q), :]

    f = pl.pallas_call(
        kernel,
        grid=(T, K),
        in_specs=[pl.BlockSpec((rows_blk, LANES), lambda t, k: (t, 0))],
        out_specs=pl.BlockSpec((1, q, LANES), lambda t, k: (k, t, 0)),
        out_shape=jax.ShapeDtypeStruct((K, T * q, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows_blk, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    from spmv_tpu.utils.timing import benchmark_fn

    total, kern = benchmark_fn(lambda d: f(d), data, iters=40)
    gb = 2 * T * rows_blk * LANES * 4 / 1e9  # read + write once each
    print(f"split-like (T={T},K={K}): kernel {kern*1e3:.3f} ms "
          f"({gb/kern:.1f} GB/s on 1x-rw model)")


def probe_streaming_bw(MB=256):
    """Re-validate the practical streaming roofline: big elementwise
    copy (read+write), slope-timed."""
    rows = MB * 1024 * 1024 // (LANES * 4)
    data = jnp.asarray(
        np.random.default_rng(1).standard_normal((rows, LANES)),
        dtype=jnp.float32)

    def kernel(in_ref, out_ref):
        out_ref[...] = in_ref[...] * 1.0000001

    blk = 2048
    f = pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[pl.BlockSpec((blk, LANES), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((blk, LANES), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    from spmv_tpu.utils.timing import benchmark_fn

    total, kern = benchmark_fn(lambda d: f(d), data, iters=20)
    gb = 2 * rows * LANES * 4 / 1e9
    print(f"streaming copy {MB} MB: kernel {kern*1e3:.3f} ms "
          f"-> {gb/kern:.1f} GB/s (r+w)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_revisit()
    probe_write_pattern()
    probe_streaming_bw(64)
    probe_streaming_bw(256)
