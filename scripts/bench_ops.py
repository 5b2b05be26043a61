"""TPU timings for the ops layer beyond SpMV: SpGEMM numeric phase,
triangular solve, ILU(0) apply, and CG iteration cost.

Each section is independent and prints one summary line; run on the
attached chip (falls back to CPU if JAX_PLATFORMS=cpu).

Usage: python scripts/bench_ops.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def banded(n, band):
    from spmv_tpu.io.generate import banded_csr

    return banded_csr(n, bandwidth=band, seed=3)


def poisson2d(m):
    """5-point 2-D Poisson stencil on an m x m grid (SPD)."""
    import numpy as np
    from spmv_tpu.formats import COO, coo_to_csr

    n = m * m
    i = np.arange(n)
    r, c = divmod(i, m)
    rows, cols, vals = [i], [i], [np.full(n, 4.0, np.float32)]
    for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        rr, cc = r + dr, c + dc
        k = (rr >= 0) & (rr < m) & (cc >= 0) & (cc < m)
        rows.append(i[k]); cols.append((rr * m + cc)[k])
        vals.append(np.full(int(k.sum()), -1.0, np.float32))
    coo = COO(n, n, np.concatenate(rows).astype(np.int32),
              np.concatenate(cols).astype(np.int32), np.concatenate(vals))
    return coo_to_csr(coo)


def bench_spgemm(quick: bool):
    import jax.numpy as jnp

    from spmv_tpu.kernels import spgemm as sg
    from spmv_tpu.ops.semiring import PLUS_TIMES, MIN_PLUS
    from spmv_tpu.utils.timing import benchmark_fn

    n = 100_000 if quick else 400_000
    A = banded(n, 9)
    t0 = time.perf_counter()
    plan = sg._plan(A, A)
    t_sym = time.perf_counter() - t0
    V, sym = plan["V"], plan["sym"]
    n_triples = int(sym["n_triples"])
    Bx = jnp.asarray(np.asarray(A.Ax))

    for name, sr in (("plus_times", PLUS_TIMES), ("min_plus", MIN_PLUS)):
        fn = lambda bx: sg._numeric_xla(V, bx, sr)
        total_s, kern_s = benchmark_fn(fn, Bx, iters=20)
        print(f"spgemm[{name}] numeric(xla): {n_triples/1e6:.1f}M triples "
              f"{kern_s*1e3:.2f} ms -> {n_triples/kern_s/1e9:.2f} Gtriples/s "
              f"(symbolic host {t_sym:.2f}s, nnzC={sym['Cj'].shape[0]})",
              flush=True)


def bench_sptrsv(quick: bool):
    from spmv_tpu.kernels.trisolve import sptrsv, ilu0, ilu0_apply
    from spmv_tpu.utils.timing import benchmark_fn

    n = 65_536 if quick else 262_144
    A = banded(n, 5)
    # lower triangle of A (diagonal included)
    import numpy as np
    from spmv_tpu.formats import CSR

    Ap = np.asarray(A.Ap); Aj = np.asarray(A.Aj); Ax = np.asarray(A.Ax)
    rows = np.repeat(np.arange(n), Ap[1:] - Ap[:-1])
    m = Aj <= rows
    lens = np.bincount(rows[m], minlength=n)
    Lp = np.zeros(n + 1, np.int64); np.cumsum(lens, out=Lp[1:])
    L = CSR(n, n, Lp, Aj[m], np.where(Aj[m] == rows[m], 4.0, Ax[m]).astype(np.float32))

    b = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    fn = lambda bv: sptrsv(L, bv, lower=True)
    total_s, kern_s = benchmark_fn(fn, b, iters=12)
    print(f"sptrsv: n={n} nnz={L.nnz} {kern_s*1e3:.2f} ms/solve "
          f"-> {L.nnz/kern_s/1e9:.3f} Gnnz/s", flush=True)

    Lf, Uf = ilu0(A)
    fn2 = lambda rv: ilu0_apply(Lf, Uf, rv)
    total_s, kern_s = benchmark_fn(fn2, b, iters=12)
    print(f"ilu0_apply: n={n} nnz(L+U)={Lf.nnz+Uf.nnz} {kern_s*1e3:.2f} ms "
          f"-> {(Lf.nnz+Uf.nnz)/kern_s/1e9:.3f} Gnnz/s", flush=True)


def bench_cg(quick: bool):
    from spmv_tpu.solvers import cg

    g = 192 if quick else 384
    A = poisson2d(g)
    b = np.ones(A.n_rows, np.float32)
    for M in (None, "jacobi"):
        t0 = time.perf_counter()
        x, info = cg(A, b, M=M, maxiter=100, rtol=0.0)
        el = time.perf_counter() - t0
        iters = int(info["iters"])
        print(f"cg[M={M}]: n={A.n_rows} nnz={A.nnz} {iters} iters {el:.2f}s "
              f"-> {el/max(iters,1)*1e3:.2f} ms/iter "
              f"(resnorm {float(info['resnorm']):.2e})", flush=True)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    for name, f in (("spgemm", bench_spgemm), ("sptrsv", bench_sptrsv),
                    ("cg", bench_cg)):
        try:
            f(quick)
        except Exception as e:
            print(f"bench_ops {name} failed: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
