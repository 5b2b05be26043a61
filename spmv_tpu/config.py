"""Global configuration for spmv_tpu.

Compile-time-switch analog of the reference's preprocessor flags
(ref: common.cuh:8, timer.hpp:6, cusp.cuh:13, LightSpMV.cuh:19), done
the JAX way: process-level toggles with environment overrides.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_interpret_override: Optional[bool] = None


def set_interpret(value: Optional[bool]) -> None:
    """Force Pallas interpreter mode on/off (None = auto-detect).

    Interpreter mode is how kernels run on CPU (tests, multi-host
    simulation); on a real TPU the compiled Mosaic path is used.
    """
    global _interpret_override
    _interpret_override = value


def use_interpret() -> bool:
    if _interpret_override is not None:
        return _interpret_override
    env = os.environ.get("SPMV_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() not in ("tpu", "axon")


_plan_dir_override: Optional[str] = None


def set_plan_dir(path: Optional[str]) -> None:
    """Directory for the on-disk plan cache (None disables)."""
    global _plan_dir_override
    _plan_dir_override = path


def plan_dir() -> Optional[str]:
    """On-disk plan cache directory, or None when disabled.

    Set via set_plan_dir() or SPMV_TPU_PLAN_DIR. Plans are pure
    functions of (matrix, policy); caching them turns the O(nnz) host
    planning cost into a one-time build per matrix (utils/plancache).
    """
    if _plan_dir_override is not None:
        return _plan_dir_override or None
    return os.environ.get("SPMV_TPU_PLAN_DIR") or None


def _default_cache_dir() -> str:
    """Default compile-cache path, anchored to the package's parent
    (the repo checkout) rather than the cwd, so callers invoked from
    other directories share one cache instead of scattering them."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "scratch", "xla_cache")


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache (idempotent).

    SpMV kernels are compiled fresh per process; on the tunneled TPU
    backend a cold zoo costs minutes of XLA compiles before the first
    measurement. The persistent cache makes repeat benchmark runs
    (bench.py, the harness CLI) pay that once per machine. Disable
    with SPMV_TPU_COMPILE_CACHE=0; set it to a path to relocate the
    cache ('1'/'true' mean "enabled at the default path"). Returns the
    cache dir in use, or None when disabled/unsupported.
    """
    env = os.environ.get("SPMV_TPU_COMPILE_CACHE")
    if env in ("0", "false", "False"):
        return None
    if env in ("1", "true", "True"):
        env = None  # truthy flag = enabled, not a directory name
    path = path or env or _default_cache_dir()
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every kernel, not just slow-to-compile ones: the win
        # here is skipping the tunnel round-trips, not host CPU time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        # older jax without these config keys: leave nothing half-set
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except AttributeError:
            pass
        return None
    return path
