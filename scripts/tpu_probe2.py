"""Probe 2: Mosaic dynamic_gather capabilities and throughput.

Mosaic lowers lax.gather to tpu.dynamic_gather along lanes (axis=1) or
sublanes (axis=0) when table/indices/output share one 2-D shape
(jax/_src/pallas/mosaic/lowering.py:2464-2524). This measures:

  sub_gather[S]  : out[s,l] = tab[idx[s,l], l]  for table height S
  lane_gather[S] : out[s,l] = tab[s, idx[s,l]]
  route3[S]      : lane -> sublane -> lane gather chain (the in-register
                   arbitrary-permutation kernel), correctness + speed

Timing is device-chained (see tpu_probe.py).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def chain_time(fn, x0, iters=20):
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
    assert np.isfinite(s), "non-finite checksum"
    return el / iters


def main():
    d = jax.devices()[0]
    print(f"device: {d.device_kind} jax={jax.__version__}")
    rng = np.random.default_rng(0)

    for axis in (0, 1):
        for S in (8, 64, 512, 2048, 8192, 16384):
            G = S * 128  # gathers per kernel invocation
            reps = max(1, (1 << 22) // G)  # ~4M gathers per dispatch

            def gk(tab_ref, idx_ref, o_ref):
                o_ref[...] = jnp.take_along_axis(
                    tab_ref[...], idx_ref[...], axis=axis)

            def run(tab, idx=None):
                idxv = idx
                return pl.pallas_call(
                    gk,
                    grid=(reps,),
                    in_specs=[pl.BlockSpec((S, 128), lambda i: (0, 0)),
                              pl.BlockSpec((S, 128), lambda i: (i, 0))],
                    out_specs=pl.BlockSpec((S, 128), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct((reps * S, 128),
                                                   jnp.float32),
                )(tab, idxv)

            tab = jnp.asarray(rng.standard_normal((S, 128)).astype(np.float32))
            hi = S if axis == 0 else 128
            idx = jnp.asarray(
                rng.integers(0, hi, (reps * S, 128)).astype(np.int32))

            # correctness (single rep) via numpy
            try:
                out = np.asarray(run(tab, idx))
            except Exception as e:
                print(f"axis={axis} S={S:6d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")
                continue
            tnp = np.asarray(tab)
            inp = np.asarray(idx)
            if axis == 0:
                want = tnp[inp, np.arange(128)[None, :]]
            else:
                srow = np.arange(reps * S) % S
                want = tnp[srow[:, None], inp]
            ok = np.allclose(out, want)

            t = chain_time(lambda v: run(tab, v), idx, iters=10)
            g = reps * G
            print(f"axis={axis} S={S:6d}: ok={ok}  {t*1e3:8.3f} ms "
                  f" {g/t/1e9:7.2f} G gathers/s  {8*g/t/1e9:7.1f} GB/s(idx+out)")

    # --- route3: arbitrary permutation via lane,sub,lane gathers ---
    S = 4096
    N = S * 128

    def rk(a_ref, l1_ref, s2_ref, l3_ref, o_ref):
        a = jnp.take_along_axis(a_ref[...], l1_ref[...], axis=1)
        a = jnp.take_along_axis(a, s2_ref[...], axis=0)
        o_ref[...] = jnp.take_along_axis(a, l3_ref[...], axis=1)

    def route3(a, l1, s2, l3):
        return pl.pallas_call(
            rk,
            in_specs=[pl.BlockSpec((S, 128), lambda: (0, 0))] * 4,
            out_specs=pl.BlockSpec((S, 128), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        )(a, l1, s2, l3)

    a = jnp.asarray(rng.standard_normal((S, 128)).astype(np.float32))
    l1 = jnp.asarray(rng.integers(0, 128, (S, 128)).astype(np.int32))
    s2 = jnp.asarray(rng.integers(0, S, (S, 128)).astype(np.int32))
    l3 = jnp.asarray(rng.integers(0, 128, (S, 128)).astype(np.int32))
    try:
        out = np.asarray(route3(a, l1, s2, l3))
        anp, i1, i2, i3 = map(np.asarray, (a, l1, s2, l3))
        t1 = np.take_along_axis(anp, i1, 1)
        t2 = np.take_along_axis(t1, i2, 0)
        want = np.take_along_axis(t2, i3, 1)
        ok = np.allclose(out, want)
        t = chain_time(lambda v: route3(v, l1, s2, l3), a, iters=10)
        print(f"route3 S={S}: ok={ok}  {t*1e3:8.3f} ms  "
              f"{N/t/1e9:7.2f} G elems/s")
    except Exception as e:
        print(f"route3: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
