"""String-dispatched SpMV kernel registry.

TPU-native rebuild of the reference's X-macro registry + uniform
dispatch (ref: include/spmv.h:18-48): a string kind maps to a kernel
entry; unknown kinds raise with the list of valid kinds. The
documented extension point — "add a label + function" — becomes the
`@register` decorator (ref: README.md:28-46).

Kernel entry contract::

    @register("mykind", supports_semiring=True)
    def mykind(A: CSR, x: jax.Array, *, semiring: Semiring) -> jax.Array:
        ...

Kernels may precompute a host-side *plan* for a matrix (layout
reshuffles, merge-path coordinates, binning); plans must be cached via
`plan_cache` so repeated calls are launch-only, mirroring how the
reference amortizes (or fails to amortize, see main.cu:102-113) its
per-call setup.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from spmv_tpu.formats import CSR
from spmv_tpu.ops.semiring import Semiring, PLUS_TIMES


@dataclasses.dataclass
class KernelEntry:
    name: str
    fn: Callable
    supports_semiring: bool
    doc: str
    reference_analog: str = ""


_REGISTRY: Dict[str, KernelEntry] = {}
_ALIASES: Dict[str, str] = {}


def register(
    name: str,
    *,
    supports_semiring: bool = False,
    reference_analog: str = "",
    aliases: tuple = (),
):
    """Register an SpMV kernel under a string kind (ref: spmv.h:18-27)."""

    def deco(fn):
        entry = KernelEntry(
            name=name,
            fn=fn,
            supports_semiring=supports_semiring,
            doc=(fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else "",
            reference_analog=reference_analog,
        )
        _REGISTRY[name] = entry
        for a in aliases:
            _ALIASES[a] = name
        return fn

    return deco


def get_kernel(kind: str) -> KernelEntry:
    kind = _ALIASES.get(kind, kind)
    if kind not in _REGISTRY:
        raise KeyError(
            f"unknown SpMV kind {kind!r}; valid kinds: {sorted(_REGISTRY)}"
            f" (aliases: {sorted(_ALIASES)})"
        )  # ref: spmv.h:46-47 unknown-kind error
    return _REGISTRY[kind]


def list_kinds(include_aliases: bool = False):
    kinds = sorted(_REGISTRY)
    if include_aliases:
        kinds += sorted(_ALIASES)
    return kinds


# Per-matrix plan caches, keyed by (CSR identity, plan key).
import weakref

_PLAN_CACHES: "weakref.WeakKeyDictionary[CSR, dict]" = weakref.WeakKeyDictionary()


def plan_cache(A: CSR, key, builder: Callable[[], object]):
    """Fetch-or-build a cached plan for matrix A."""
    cache = _PLAN_CACHES.get(A)
    if cache is None:
        cache = {}
        _PLAN_CACHES[A] = cache
    if key not in cache:
        cache[key] = builder()
    return cache[key]


def spmv(
    kind: str,
    A: CSR,
    x,
    semiring: Optional[Semiring] = None,
):
    """Uniform dispatch: y = A ⊗ x with the named kernel.

    Mirrors SpMV(kind_str, ...) (ref: spmv.h:29-48). `semiring=None`
    means the plain (+,×) ring; passing a semiring to a kernel that
    does not support one raises.
    """
    entry = get_kernel(kind)
    sr = semiring if semiring is not None else PLUS_TIMES
    if semiring is not None and sr is not PLUS_TIMES and not entry.supports_semiring:
        raise ValueError(
            f"kind {entry.name!r} does not support semirings; "
            f"semiring-capable kinds: "
            f"{[k for k, e in _REGISTRY.items() if e.supports_semiring]}"
        )
    x = jnp.asarray(x)
    if x.shape != (A.n_cols,):
        raise ValueError(f"x has shape {x.shape}, expected ({A.n_cols},)")
    return entry.fn(A, x, semiring=sr)


def SpMV(kind, n_rows, n_cols, nnz, Ap, Aj, Ax, x, semiring=None):
    """Reference-signature shim (ref: spmv.h:29-34, README.md:32-38).

    SpMV(kind, n_rows, n_cols, nnz, Ap, Aj, Ax, x) -> y. Provided so a
    user of the reference's C API shape finds the same entry point; the
    container API `spmv(kind, A, x)` is the idiomatic path (it caches
    per-matrix plans).
    """
    Ap = np.asarray(Ap)
    Aj = np.asarray(Aj)
    Ax = np.asarray(Ax)
    if Ap.shape != (int(n_rows) + 1,):
        raise ValueError("Ap must have shape (n_rows+1,)")
    if Aj.shape != (int(nnz),) or Ax.shape != (int(nnz),):
        raise ValueError("Aj/Ax must have shape (nnz,)")
    A = CSR(int(n_rows), int(n_cols), Ap, Aj, Ax)
    return spmv(kind, A, x, semiring=semiring)
