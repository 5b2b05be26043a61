"""Probe 3: the primitives of the planned-permutation (shuffle) engine.

1. transpose  : jnp.transpose of a (128,128) f32 tile inside pallas
2. tile_perm  : arbitrary permutation of a (128,128) tile =
                lane-gather -> transpose -> lane-gather -> transpose
                -> lane-gather   (Benes row-col-row routing; here we
                just check each stage compiles + measure raw speed with
                random stage indices, correctness is exercised by the
                real planner later)
3. spgrid     : grid where BOTH input and output block positions come
                from scalar-prefetched plan arrays (the radix-pass
                skeleton): out[plan_out[t]] = f(in[plan_in[t]])
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_time(fn, x0, iters=10):
    def body(_, carry):
        x, acc = carry
        y = fn(x)
        acc = acc + y.reshape(-1)[0].astype(jnp.float32)
        taint = jnp.where(jnp.isnan(acc), y.reshape(-1)[0].astype(x.dtype),
                          jnp.zeros((), x.dtype))
        x = x.at[(0,) * x.ndim].add(taint)
        return x, acc

    @jax.jit
    def run(x):
        x, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc + x.reshape(-1)[0].astype(jnp.float32)

    float(run(x0))
    t0 = time.perf_counter()
    s = float(run(x0))
    el = time.perf_counter() - t0
    assert np.isfinite(s)
    return el / iters


def main():
    rng = np.random.default_rng(0)
    B = 128
    nblk = 512  # 512 tiles of 16K = 8.4M elements per dispatch
    N = nblk * B * B

    # 1+2: transpose & full tile-permutation chain
    def tk(a_ref, i1_ref, i2_ref, i3_ref, o_ref):
        a = jnp.take_along_axis(a_ref[...], i1_ref[...], axis=1)
        a = a.T
        a = jnp.take_along_axis(a, i2_ref[...], axis=1)
        a = a.T
        o_ref[...] = jnp.take_along_axis(a, i3_ref[...], axis=1)

    def tile_perm(a, i1, i2, i3):
        return pl.pallas_call(
            tk,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((B, B), lambda t: (t, 0))] * 4,
            out_specs=pl.BlockSpec((B, B), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((nblk * B, B), jnp.float32),
        )(a, i1, i2, i3)

    a = jnp.asarray(rng.standard_normal((nblk * B, B)).astype(np.float32))
    i1 = jnp.asarray(rng.integers(0, B, (nblk * B, B)).astype(np.int32))
    i2 = jnp.asarray(rng.integers(0, B, (nblk * B, B)).astype(np.int32))
    i3 = jnp.asarray(rng.integers(0, B, (nblk * B, B)).astype(np.int32))
    try:
        out = np.asarray(tile_perm(a, i1, i2, i3))
        # numpy check of the same chain
        av = np.asarray(a).reshape(nblk, B, B)
        w = np.take_along_axis(av, np.asarray(i1).reshape(nblk, B, B), 2)
        w = w.transpose(0, 2, 1)
        w = np.take_along_axis(w, np.asarray(i2).reshape(nblk, B, B), 2)
        w = w.transpose(0, 2, 1)
        w = np.take_along_axis(w, np.asarray(i3).reshape(nblk, B, B), 2)
        ok = np.allclose(out, w.reshape(nblk * B, B))
        t = chain_time(lambda v: tile_perm(v, i1, i2, i3), a)
        print(f"tile_perm : ok={ok}  {t*1e3:8.3f} ms  {N/t/1e9:6.2f} G elems/s "
              f" {(4*4+4)*N/t/1e9:6.1f} GB/s(all streams)")
    except Exception as e:
        print(f"tile_perm : FAILED {type(e).__name__}: {str(e)[:300]}")

    # 3: scalar-prefetch-driven in AND out block positions
    def sk(pin_ref, pout_ref, a_ref, o_ref):
        o_ref[...] = a_ref[...] * 2.0

    pin = np.arange(nblk, dtype=np.int32)
    pout = np.arange(nblk, dtype=np.int32)
    rng.shuffle(pin)
    rng.shuffle(pout)
    pin_j = jnp.asarray(pin)
    pout_j = jnp.asarray(pout)

    def spgrid(a):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((B, B), lambda t, pin, pout: (pin[t], 0))],
            out_specs=pl.BlockSpec((B, B), lambda t, pin, pout: (pout[t], 0)),
        )
        return pl.pallas_call(
            sk,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((nblk * B, B), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(pin_j, pout_j, a)

    try:
        out = np.asarray(spgrid(a))
        av = np.asarray(a).reshape(nblk, B, B)
        want = np.zeros_like(av)
        want[pout] = 2.0 * av[pin]
        ok = np.allclose(out.reshape(nblk, B, B), want)
        t = chain_time(spgrid, a)
        print(f"spgrid    : ok={ok}  {t*1e3:8.3f} ms  {N/t/1e9:6.2f} G elems/s "
              f" {8*N/t/1e9:6.1f} GB/s(in+out)")
    except Exception as e:
        print(f"spgrid    : FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
