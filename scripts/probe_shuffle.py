import time, numpy as np, jax, jax.numpy as jnp
from spmv_tpu.kernels.shuffle import plan_shuffle, apply_shuffle, shuffle_device_arrays, TILE

rng = np.random.default_rng(0)
n_in_tiles = 256            # 4.19M slots (32 steps x 8 tiles)
live_frac = 0.90
F, G = 440, 22              # final tiles, regions (g_size = 20)
kappa = 9500
total = min(int(n_in_tiles*TILE*live_frac), F*kappa)
dsts = (np.arange(F)[:,None]*TILE + np.arange(kappa)[None,:]).reshape(-1)[:total]
rng.shuffle(dsts)
dst = np.full(n_in_tiles*TILE, -1, np.int64)
dst[rng.permutation(n_in_tiles*TILE)[:total]] = dsts
t0=time.perf_counter()
plan = plan_shuffle(dst, F, G, sbt=8, q1=8)
print(f"plan: {time.perf_counter()-t0:.1f}s  passes={[(p.n_steps,p.K,p.Q) for p in plan.passes]}  out_rows={plan.out_rows}")
data = rng.standard_normal(n_in_tiles*TILE).astype(np.float32)
dev = shuffle_device_arrays(plan)
dj = jnp.asarray(data.reshape(-1,128))
out = np.asarray(apply_shuffle(dj, plan, dev)).reshape(-1)
live = dst>=0
slots = plan.slot_of_dst[dst[live]]
assert (slots>=0).all()
np.testing.assert_array_equal(out[slots], data[live])
print("correct on TPU")
# chained timing
def chain(fn, x0, iters=10):
    def body(_, c):
        x, acc = c
        y = fn(x)
        acc = acc + y.reshape(-1)[0].astype(jnp.float32)
        taint = jnp.where(jnp.isnan(acc), y.reshape(-1)[0].astype(x.dtype), jnp.zeros((), x.dtype))
        return x.at[0,0].add(taint), acc
    @jax.jit
    def run(x):
        x, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
        return acc + x[0,0]
    float(run(x0)); t0=time.perf_counter(); s=float(run(x0)); el=time.perf_counter()-t0
    assert np.isfinite(s); return el/iters
t = chain(lambda v: apply_shuffle(v, plan, dev), dj)
n = total
print(f"shuffle: {t*1e3:.3f} ms  {n/t/1e9:.2f} G live elems/s")
