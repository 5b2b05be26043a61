"""Cost of individual (128,128) tile ops inside a pallas kernel:
gathers, transposes, u8->i32 casts, fp32 matmuls at two precisions.
Each variant runs REPS times per tile over many tiles; cost/op =
slope / (tiles * REPS). Run ON TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.utils.timing import benchmark_fn

LANES = 128
TILES = 256
REPS = 8


def run_variant(name, body, extra_inputs=()):
    def kernel(data_ref, *rest):
        out_ref = rest[-1]
        refs = rest[:-1]
        v = data_ref[...]
        for _ in range(REPS):
            v = body(v, refs)
        out_ref[...] = v.astype(jnp.float32)

    in_specs = [pl.BlockSpec((LANES, LANES), lambda t: (t, 0))]
    for a in extra_inputs:
        in_specs.append(pl.BlockSpec((LANES, LANES), lambda t: (t, 0)))
    f = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((LANES, LANES), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((TILES * LANES, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((TILES * LANES, LANES)),
                       dtype=jnp.float32)
    args = [data] + [jnp.asarray(a) for a in extra_inputs]

    def go(d):
        return f(d, *args[1:])

    total, kern = benchmark_fn(go, data, iters=60)
    per_op = kern / (TILES * REPS) * 1e9
    print(f"{name:28s} {kern*1e3:8.4f} ms   {per_op:7.1f} ns/op", flush=True)


def main():
    rng = np.random.default_rng(1)
    idx_u8 = rng.integers(0, 128, (TILES * LANES, LANES)).astype(np.uint8)
    idx_i32 = idx_u8.astype(np.int32)

    run_variant("noop (v*1.0001)", lambda v, r: v * 1.0001)
    run_variant("transpose", lambda v, r: v.T * 1.0001)
    run_variant("gather i32 idx",
                lambda v, r: jnp.take_along_axis(
                    v, r[0][...], axis=1),
                extra_inputs=(idx_i32,))
    run_variant("gather u8->i32 idx",
                lambda v, r: jnp.take_along_axis(
                    v, r[0][...].astype(jnp.int32), axis=1),
                extra_inputs=(idx_u8,))
    run_variant("u8->i32 cast only",
                lambda v, r: v + r[0][...].astype(jnp.int32)
                .astype(jnp.float32) * 1e-9,
                extra_inputs=(idx_u8,))

    def mm_highest(v, r):
        return jax.lax.dot_general(
            v, r[0][...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def mm_default(v, r):
        return jax.lax.dot_general(
            v, r[0][...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    tri = np.triu(np.ones((LANES, LANES), np.float32))
    tri_t = np.broadcast_to(tri, (TILES * LANES // LANES, LANES, LANES))
    tri_big = np.tile(tri, (TILES, 1))
    run_variant("matmul fp32 HIGHEST", mm_highest, extra_inputs=(tri_big,))
    run_variant("matmul fp32 default", mm_default, extra_inputs=(tri_big,))

    # full 3-stage route
    def route(v, r):
        a = jnp.take_along_axis(v, r[0][...].astype(jnp.int32), axis=1).T
        a = jnp.take_along_axis(a, r[1][...].astype(jnp.int32), axis=1).T
        return jnp.take_along_axis(a, r[2][...].astype(jnp.int32), axis=1)

    run_variant("3-stage route (u8)", route,
                extra_inputs=(idx_u8, idx_u8, idx_u8))

    def route_i32(v, r):
        a = jnp.take_along_axis(v, r[0][...], axis=1).T
        a = jnp.take_along_axis(a, r[1][...], axis=1).T
        return jnp.take_along_axis(a, r[2][...], axis=1)

    run_variant("3-stage route (i32)", route_i32,
                extra_inputs=(idx_i32, idx_i32, idx_i32))


if __name__ == "__main__":
    main()


def probe_batched():
    """Do gathers/transposes/matmuls amortize at (1024,128) shapes?"""
    rng = np.random.default_rng(2)
    BT = 8  # tiles per op
    rows = TILES * LANES
    idx = jnp.asarray(rng.integers(0, 128, (rows, LANES)), dtype=jnp.int32)

    def batched(name, body, extra=()):
        def kernel(data_ref, *rest):
            out_ref = rest[-1]
            refs = rest[:-1]
            v = data_ref[...]
            v = body(v, refs)
            out_ref[...] = v.astype(jnp.float32)

        n_steps = TILES // BT
        in_specs = [pl.BlockSpec((BT * LANES, LANES), lambda t: (t, 0))]
        for _ in extra:
            in_specs.append(
                pl.BlockSpec((BT * LANES, LANES), lambda t: (t, 0)))
        f = pl.pallas_call(
            kernel, grid=(n_steps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((BT * LANES, LANES), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        data = jnp.asarray(rng.standard_normal((rows, LANES)),
                           dtype=jnp.float32)
        args = [jnp.asarray(a) for a in extra]
        total, kern = benchmark_fn(lambda d: f(d, *args), data, iters=60)
        print(f"{name:34s} {kern*1e3:8.4f} ms  "
              f"{kern/TILES*1e9:7.1f} ns/tile-equiv", flush=True)

    batched("big gather (1024,128)",
            lambda v, r: jnp.take_along_axis(v, r[0][...], axis=1),
            extra=(idx,))

    def t8(v, r):
        parts = [v[i * LANES:(i + 1) * LANES, :].T for i in range(BT)]
        return jnp.concatenate(parts, axis=0)

    batched("8x transpose (concat)", t8)

    tri = np.triu(np.ones((LANES, LANES), np.float32))

    def mm_big(v, r):
        return jax.lax.dot_general(
            v, r[0][...][:LANES, :], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    batched("big matmul (1024,128)@(128,128)", mm_big,
            extra=(np.tile(tri, (TILES, 1)),))


probe_batched()
