"""DIA (diagonal-format) SpMV: the regular-matrix speed-of-light kind.

Banded/stencil matrices (BASELINE.md config 2's regular regime) are
structurally shifts: y[r] = Σ_d A[r, r+d] * x[r+d] over a small set
of diagonals d. On TPU that is ELEMENTWISE — no gathers, no column
indices, no routing: one fused pass over n_diags value streams and
shifted x slices, at streaming bandwidth. The CSR SoL model charges
12 B/nnz (Ax + Aj + x-gather); DIA moves ~8 B/nnz (Aj is implicit),
so this kind can honestly exceed "100% of CSR speed-of-light".

The reference has no DIA kind (its zoo is CSR-only); this is a
beyond-reference format specialization (SURVEY §7 step 5 spirit),
auto-selected by the csr_vector family for diagonal-sparse matrices
and silently falling back to the stream pipeline otherwise.

Semiring-generalized like every kind: y[r] = reduce_d combine(Ad, xs)
with absent diagonal slots masked to the identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.ops.registry import register, plan_cache, resolve_val_dtype
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES

MAX_DIAGS = 64          # diagonals before DIA stops being "regular"
MAX_FILL = 4.0          # DIA slots per nnz before padding outweighs


def diag_profile(A: CSR):
    """(diags, fill) or None when the matrix is not diagonal-sparse."""
    if A.nnz == 0 or A.n_rows != A.n_cols:
        return None
    Ap = np.asarray(A.Ap, np.int64)
    Aj = np.asarray(A.Aj, np.int64)
    rows = np.repeat(np.arange(A.n_rows, dtype=np.int64),
                     Ap[1:] - Ap[:-1])
    d = Aj - rows
    uniq = np.unique(d)
    if uniq.size > MAX_DIAGS:
        return None
    fill = uniq.size * A.n_rows / max(A.nnz, 1)
    if fill > MAX_FILL:
        return None
    return uniq, fill


def build_dia_plan(A: CSR, diags: np.ndarray):
    """Dense per-diagonal value lanes + validity mask."""
    Ap = np.asarray(A.Ap, np.int64)
    Aj = np.asarray(A.Aj, np.int64)
    Ax = np.asarray(A.Ax)
    rows = np.repeat(np.arange(A.n_rows, dtype=np.int64),
                     Ap[1:] - Ap[:-1])
    d = Aj - rows
    k = np.searchsorted(diags, d)
    vals = np.zeros((diags.size, A.n_rows), Ax.dtype)
    valid = np.zeros((diags.size, A.n_rows), np.int8)
    # CSR may carry duplicate (row, col) entries: accumulate like the
    # oracle does (+ for the storage; semiring combine sees the sum,
    # matching coo_to_csr's duplicate policy)
    np.add.at(vals, (k, rows), Ax)
    valid[k, rows] = 1
    return jnp.asarray(vals), jnp.asarray(valid), tuple(
        int(x) for x in diags)


@functools.partial(jax.jit, static_argnames=("sr", "diags", "n_rows"))
def _dia_matvec_xla(vals, valid, x, *, sr: Semiring, diags, n_rows):
    """XLA fallback (any diagonal offsets): one shifted-slice pass per
    diagonal. Re-reads the y accumulator per diagonal, so the Pallas
    kernel below is ~3x leaner where its halo gate permits."""
    val_dtype = vals.dtype
    ident = sr.identity_for(np.dtype(val_dtype))
    lo = -min(min(diags), 0)
    hi = max(max(diags), 0)
    xp = jnp.pad(x.astype(val_dtype), (lo, hi))
    y = jnp.full((n_rows,), ident, val_dtype)
    for i, d in enumerate(diags):
        xs = jax.lax.dynamic_slice_in_dim(xp, lo + d, n_rows)
        t = jnp.where(valid[i] > 0, sr.combine(vals[i], xs), ident)
        y = sr.reduce(y, t)
    return y


LANES = 128
BLK = 64          # y rows of (64, 128) per grid step = 8192 elements
MAX_SHIFT = 8000  # |diagonal| the 3-block halo covers


def _dia_kernel(sr: Semiring, identity: float, diags, D: int):
    from jax.experimental.pallas import tpu as pltpu

    def kernel(vals_ref, valid_ref, x0_ref, x1_ref, x2_ref, out_ref):
        X = jnp.concatenate([x0_ref[...], x1_ref[...], x2_ref[...]],
                            axis=0)
        li = jax.lax.broadcasted_iota(jnp.int32, (BLK, LANES), 1)
        y = jnp.full((BLK, LANES), identity, out_ref.dtype)
        for i, d in enumerate(diags):
            # X covers x-space [block_start - BLK*LANES, +2*BLK*LANES)
            s = d + BLK * LANES
            q, m = divmod(s, LANES)
            a1 = X[q:q + BLK, :]
            if m == 0:
                xs = a1
            else:
                a2 = X[q + 1:q + 1 + BLK, :]
                xs = jnp.where(li < LANES - m,
                               pltpu.roll(a1, LANES - m, 1),
                               pltpu.roll(a2, LANES - m, 1))
            vd = vals_ref[i * BLK:(i + 1) * BLK, :]
            ok = valid_ref[i * BLK:(i + 1) * BLK, :].astype(jnp.int32)
            t = jnp.where(ok > 0, sr.combine(vd, xs),
                          jnp.full_like(y, identity))
            y = sr.reduce(y, t)
        out_ref[...] = y

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "sr", "diags", "n_rows", "interpret"))
def _dia_matvec_pallas(vals, valid, x, *, sr: Semiring, diags, n_rows,
                       interpret):
    """Fused DIA pass: per (64,128) y block, read the per-diagonal
    value lanes + a 3-block x window (the ±MAX_SHIFT halo) and fold
    every diagonal in registers — one read of vals/valid, ~3 reads of
    x, one write of y."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    val_dtype = vals.dtype
    identity = float(sr.identity_for(np.dtype(val_dtype)))
    D = vals.shape[0]
    lo = -min(min(diags), 0)
    hi = max(max(diags), 0)
    n_pad = -(-n_rows // (BLK * LANES)) * (BLK * LANES)
    T = n_pad // (BLK * LANES)
    # xp covers x-space [-BLK*LANES, n_pad + BLK*LANES): one zero
    # block on each side so every diagonal's 3-block window is in
    # bounds (junk values are masked by `valid`)
    xp = jnp.pad(x.astype(val_dtype),
                 (BLK * LANES, n_pad + BLK * LANES - n_rows))
    xp2d = xp.reshape(-1, LANES)
    # per-step diag-major blocks: step t's rows are
    # [d0 rows t*BLK..t*BLK+BLK) ; d1 rows ...] (kernel indexes
    # vals_ref[i*BLK + r])
    vals_p = jnp.pad(vals, ((0, 0), (0, n_pad - n_rows))).reshape(
        D, T, BLK, LANES)
    valid_p = jnp.pad(valid, ((0, 0), (0, n_pad - n_rows))).reshape(
        D, T, BLK, LANES)
    vals_f = vals_p.transpose(1, 0, 2, 3).reshape(-1, LANES)
    valid_f = valid_p.transpose(1, 0, 2, 3).reshape(-1, LANES)

    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((D * BLK, LANES), lambda t: (t, 0)),
            pl.BlockSpec((D * BLK, LANES), lambda t: (t, 0)),
            pl.BlockSpec((BLK, LANES), lambda t: (t, 0)),
            pl.BlockSpec((BLK, LANES), lambda t: (t + 1, 0)),
            pl.BlockSpec((BLK, LANES), lambda t: (t + 2, 0)),
        ],
        out_specs=pl.BlockSpec((BLK, LANES), lambda t: (t, 0)),
    )
    del lo, hi
    y = pl.pallas_call(
        _dia_kernel(sr, identity, diags, D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES),
                                       val_dtype),
        interpret=interpret,
    )(vals_f, valid_f, xp2d, xp2d, xp2d)
    return y.reshape(-1)[:n_rows]


@register("dia", supports_semiring=True,
          reference_analog="(none — beyond-reference diagonal-format "
                           "specialization for regular matrices)")
def _dia(A: CSR, x, *, semiring: Semiring = PLUS_TIMES):
    """DIA SpMV for diagonal-sparse matrices; non-diagonal matrices
    fall back to the stream pipeline (so the kind is total, like the
    merge family's fallbacks)."""
    from spmv_tpu import config

    prof = plan_cache(A, ("dia", "profile"), lambda: diag_profile(A))
    if prof is None:
        from spmv_tpu.kernels.stream import _stream_spmv
        from spmv_tpu.ops.tuning import policy_for

        width = np.dtype(np.asarray(A.Ax).dtype).itemsize
        return _stream_spmv(A, x, semiring, policy_for(width))
    diags, _ = prof
    vals, valid, dtup = plan_cache(
        A, ("dia", "plan"), lambda: build_dia_plan(A, diags))
    x = jnp.asarray(x)
    val_dtype = resolve_val_dtype(A, x)
    if max(abs(d) for d in dtup) <= MAX_SHIFT:
        return _dia_matvec_pallas(
            vals.astype(val_dtype), valid, x, sr=semiring, diags=dtup,
            n_rows=A.n_rows, interpret=config.use_interpret())
    return _dia_matvec_xla(vals.astype(val_dtype), valid, x,
                           sr=semiring, diags=dtup, n_rows=A.n_rows)
