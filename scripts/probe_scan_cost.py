"""Bisect the scan-pass cost: I/O-only vs +cumsum vs +routes vs full.

Uses the same grid/block structure as stream._scan_pass with stub
kernels of increasing work. Run ON TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spmv_tpu.kernels.stream import _flat_cumsum, _route3
from spmv_tpu.utils.timing import benchmark_fn

LANES = 128
P = 64


def build(level, F_pad, n_bins, sbt=8):
    T = F_pad // sbt

    def kernel(bins_ref, first_ref,
               prod_ref, cid_ref, r1s1_ref, r1s2_ref, r1s3_ref,
               p1s1_ref, p1s2_ref, p1s3_ref,
               r2s1_ref, r2s2_ref, r2s3_ref, valid2_ref, y_ref):
        t = pl.program_id(0)
        k = pl.program_id(1)
        f = t * sbt + k

        def sl(ref):
            return ref[pl.ds(k * LANES, LANES), :]

        if level == 0:  # I/O only
            y_ref[...] = sl(prod_ref)[:P, :]
            return
        cid = sl(cid_ref).astype(jnp.int32)
        prod = jnp.where(cid < 16384, sl(prod_ref), 0.0)
        if level == 1:  # + masking only
            y_ref[...] = prod[:P, :]
            return
        S = _flat_cumsum(prod)
        if level == 2:  # + one cumsum
            y_ref[...] = S[:P, :]
            return
        C = _route3(S, sl(r1s1_ref), sl(r1s2_ref), sl(r1s3_ref))[:P, :]
        if level == 3:  # + one route
            y_ref[...] = C
            return
        Pv = _route3(S, sl(p1s1_ref), sl(p1s2_ref), sl(p1s3_ref))[:P, :]
        D = C - Pv
        Q = _flat_cumsum(D)
        if level == 4:  # + second route + second cumsum
            y_ref[...] = Q
            return
        Qp = jnp.concatenate([Q, Q], axis=0)
        R2 = _route3(Qp, sl(r2s1_ref), sl(r2s2_ref), sl(r2s3_ref))
        vm = valid2_ref[pl.ds(k * P, P), :].astype(jnp.int32) > 0
        y_cand = jnp.where(vm, R2[:P, :] - R2[P:, :],
                           jnp.zeros((P, LANES), R2.dtype))
        prev = jnp.where(first_ref[f] == 1, jnp.zeros_like(y_cand),
                         y_ref[...])
        y_ref[...] = prev + y_cand

    def tile_spec(rows):
        return pl.BlockSpec((rows * sbt, LANES), lambda t, k, *_: (t, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, sbt),
        in_specs=[tile_spec(LANES)] * 11 + [tile_spec(P)],
        out_specs=pl.BlockSpec(
            (P, LANES), lambda t, k, b, *_: (b[t * sbt + k], 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((n_bins + 1) * P, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )


def main():
    F_pad, n_bins = 360, 128
    rng = np.random.default_rng(0)
    prod = jnp.asarray(rng.standard_normal((F_pad * LANES, LANES)),
                       dtype=jnp.float32)
    cid = jnp.asarray(rng.integers(0, 8000, (F_pad * LANES, LANES)),
                      dtype=jnp.int16)
    routes = [jnp.asarray(rng.integers(0, 128, (F_pad * LANES, LANES)),
                          dtype=jnp.uint8) for _ in range(9)]
    valid2 = jnp.asarray(rng.integers(0, 2, (F_pad * P, LANES)),
                         dtype=jnp.int8)
    bins = jnp.asarray(rng.integers(0, n_bins, F_pad), dtype=jnp.int32)
    first = jnp.ones(F_pad, jnp.int32)

    for level in range(6):
        f = build(level, F_pad, n_bins)

        def run(p):
            return f(bins, first, p, cid, *routes, valid2)

        total, kern = benchmark_fn(run, prod, iters=60)
        print(f"level {level}: {kern*1e3:.4f} ms "
              f"({kern/F_pad*1e6:.2f} us/tile)", flush=True)


if __name__ == "__main__":
    main()
