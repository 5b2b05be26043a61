"""Probe: can Mosaic lane-gather from a WIDE (128, M) VMEM table?

The fused CSR-order pipeline idea (round 5) needs, per 16K-nnz chunk,
x values for arbitrary columns: with x resident as xlong[s, m] =
x[m*128 + s] (shape (128, n_cols/128)), a slot in sublane s = col%128
reads xlong[s, col//128] — a lane gather with indices up to
n_cols/128, i.e. far past 128. This probes (a) whether
take_along_axis on (128, M) with (128, 128) indices lowers at all,
(b) its cost vs M, and (c) the paged fallback (P gathers + selects).

Run ON the TPU: python scripts/probe_wide_gather.py
"""

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


def probe_wide(M: int):
    """out[t] = take_along_axis(xw, q[t]) with xw (128, M) resident."""
    def kernel(xw_ref, q_ref, out_ref):
        q = q_ref[...].astype(jnp.int32)
        out_ref[...] = jnp.take_along_axis(xw_ref[...], q, axis=1)

    f = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((LANES, M), lambda t: (0, 0)),
            pl.BlockSpec((LANES, LANES), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((LANES, LANES), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((TILES * LANES, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((LANES, M)), dtype=jnp.float32)
    q = jnp.asarray(rng.integers(0, M, (TILES * LANES, LANES)),
                    dtype=jnp.int32)
    try:
        ref = np.take_along_axis(np.asarray(xw), np.asarray(q[:LANES]),
                                 axis=1)
        got = np.asarray(f(xw, q)[:LANES])
        ok = np.allclose(got, ref)
        total, kern = benchmark_fn(lambda qq: f(xw, qq), q, iters=50)
        print(f"wide gather M={M:6d}: {'OK ' if ok else 'WRONG'} "
              f"{kern*1e3:8.4f} ms  {kern/TILES*1e9:7.1f} ns/tile",
              flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"wide gather M={M:6d}: FAIL {type(e).__name__}: {msg}",
              flush=True)


def probe_paged(P: int):
    """Paged fallback: P static (128,128) slices, gather+select each."""
    def kernel(xw_ref, qlo_ref, qhi_ref, out_ref):
        qlo = qlo_ref[...].astype(jnp.int32)
        qhi = qhi_ref[...].astype(jnp.int32)
        acc = jnp.zeros((LANES, LANES), jnp.float32)
        for p in range(P):
            g = jnp.take_along_axis(
                xw_ref[:, p * LANES:(p + 1) * LANES], qlo, axis=1)
            acc = jnp.where(qhi == p, g, acc)
        out_ref[...] = acc

    M = P * LANES
    f = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((LANES, M), lambda t: (0, 0)),
            pl.BlockSpec((LANES, LANES), lambda t: (t, 0)),
            pl.BlockSpec((LANES, LANES), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((LANES, LANES), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((TILES * LANES, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    rng = np.random.default_rng(1)
    xw = jnp.asarray(rng.standard_normal((LANES, M)), dtype=jnp.float32)
    q = rng.integers(0, M, (TILES * LANES, LANES))
    qlo = jnp.asarray(q % LANES, dtype=jnp.int32)
    qhi = jnp.asarray(q // LANES, dtype=jnp.int32)
    try:
        ref = np.take_along_axis(np.asarray(xw), q[:LANES], axis=1)
        got = np.asarray(f(xw, qlo, qhi)[:LANES])
        ok = np.allclose(got, ref)
        total, kern = benchmark_fn(lambda a: f(xw, a, qhi), qlo, iters=50)
        print(f"paged gather P={P:3d}:    {'OK ' if ok else 'WRONG'} "
              f"{kern*1e3:8.4f} ms  {kern/TILES*1e9:7.1f} ns/tile",
              flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"paged gather P={P:3d}:    FAIL {type(e).__name__}: {msg}",
              flush=True)


def main():
    for M in (128, 256, 1024, 4096, 8192):
        probe_wide(M)
    for P in (2, 8, 16, 64):
        probe_paged(P)


if __name__ == "__main__":
    main()
