"""Disk cache for stream plans.

Plan construction is the expensive half of the stream pipeline: the
host planner is O(nnz) over several passes (~4 min at 100M nnz on one
core). The plan is a pure function of (CSR structure, policy), so a
production deployment builds it once and ships the arrays. This module
round-trips a `StreamPlan` through one uncompressed `.npz` (plus a
small JSON header for scalars) — load is a straight mmap-read +
device upload.

The reference has no analog (every `SpMV()` call re-runs its setup,
main.cu:102-113 re-enters per-call allocations); this is part of the
"framework, not benchmark" surface.

Keying: `plan_key(A, policy)` hashes the CSR structure (Ap/Aj bytes)
and the policy fields — values (Ax) are NOT part of the key because
gather order depends only on structure... except the plan stores the
routed Ax payload, so the cache key includes the Ax bytes too. Use
`stream_plan_cached` for the full fetch-or-build-or-load flow.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

from spmv_tpu.formats import CSR

_FORMAT_VERSION = 11  # v11: variable-span x windows + balanced
# column->sublane lane remap — the gather dict gains the per-window
# x-table route streams (xr1/xr2/xr3), window start groups (g0) and
# the natural-x input row count; slot/q/xb follow the remapped layout


def plan_key(A: CSR, policy) -> str:
    h = hashlib.sha256()
    h.update(np.int64([A.n_rows, A.n_cols, A.nnz]).tobytes())
    h.update(np.ascontiguousarray(np.asarray(A.Ap)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(A.Aj)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(A.Ax)).tobytes())
    # only plan-shaping policy fields: dispatch-time knobs (scan_sbt,
    # scan_strategy) reuse the same cached plan
    fields = (policy.structural_fields()
              if hasattr(policy, "structural_fields") else vars(policy))
    h.update(repr(sorted(fields.items())).encode())
    return h.hexdigest()[:24]


def _to_host(tree, prefix, arrays, scalars):
    """Flatten a {str: array-or-scalar} dict into npz entries."""
    for k, v in tree.items():
        name = f"{prefix}.{k}"
        if isinstance(v, (bool, int, float, str)):
            scalars[name] = v
        else:
            arrays[name] = np.asarray(v)


def save_plan(plan, path: str) -> None:
    """Serialize a StreamPlan (device arrays pulled back to host)."""
    arrays: dict = {}
    scalars: dict = {
        "version": _FORMAT_VERSION,
        "n_gather_tiles": plan.n_gather_tiles,
        "n_final_tiles": plan.n_final_tiles,
        "layers": plan.layers,
        "x_rows_pad": plan.x_rows_pad,
        "n_y_blocks": plan.n_y_blocks,
        "sh.in_rows": plan.shuffle.in_rows,
        "sh.out_rows": plan.shuffle.out_rows,
        "sh.n_passes": len(plan.shuffle.passes),
    }
    arrays["hot_cols"] = np.asarray(plan.hot_cols)
    arrays["sh.slot_of_dst"] = np.asarray(plan.shuffle.slot_of_dst)
    _to_host(plan.gather, "gather", arrays, scalars)
    _to_host(plan.scan, "scan", arrays, scalars)
    if plan.reduce is not None:
        _to_host(plan.reduce, "reduce", arrays, scalars)
    for i, p in enumerate(plan.shuffle.passes):
        pre = f"sh.p{i}"
        for f in ("n_steps", "sbt", "K", "Q", "in_rows", "out_rows"):
            scalars[f"{pre}.{f}"] = getattr(p, f)
        scalars[f"{pre}.stitch"] = str(p.stitch)
        for f in ("s1", "s2", "s3", "starts", "pos"):
            arrays[f"{pre}.{f}"] = np.asarray(getattr(p, f))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, __header__=np.frombuffer(
            json.dumps(scalars).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


def load_plan(path: str):
    """Load a StreamPlan saved by save_plan and upload to device."""
    import jax.numpy as jnp

    from spmv_tpu.kernels.shuffle import (
        ShufflePlan,
        SplitPass,
        shuffle_device_arrays,
    )
    from spmv_tpu.kernels.stream import StreamPlan
    from spmv_tpu.utils.transfer import device_put_chunked as dput

    z = np.load(path)
    scalars = json.loads(bytes(z["__header__"]).decode())
    if scalars.get("version") != _FORMAT_VERSION:
        raise ValueError(
            f"plan file {path}: version {scalars.get('version')} != "
            f"{_FORMAT_VERSION}")

    passes = []
    for i in range(scalars["sh.n_passes"]):
        pre = f"sh.p{i}"
        passes.append(SplitPass(
            n_steps=scalars[f"{pre}.n_steps"], sbt=scalars[f"{pre}.sbt"],
            K=scalars[f"{pre}.K"], Q=scalars[f"{pre}.Q"],
            in_rows=scalars[f"{pre}.in_rows"],
            out_rows=scalars[f"{pre}.out_rows"],
            stitch=scalars[f"{pre}.stitch"],
            s1=z[f"{pre}.s1"], s2=z[f"{pre}.s2"], s3=z[f"{pre}.s3"],
            starts=z[f"{pre}.starts"], pos=z[f"{pre}.pos"]))
    plan_sh = ShufflePlan(passes=passes, in_rows=scalars["sh.in_rows"],
                          out_rows=scalars["sh.out_rows"],
                          slot_of_dst=z["sh.slot_of_dst"])

    gather = {k[len("gather."):]: dput(z[k]) for k in z.files
              if k.startswith("gather.")}
    if "xr1" in gather and not (
            "gather.g0" in z.files and "gather.x_nat_rows" in scalars):
        # remap layout missing its window metadata: a file written by
        # a partially-updated process (mixed-edit window) — rebuild
        raise ValueError(
            f"plan file {path}: remap layout missing g0/x_nat_rows")
    # merge-piece arrays (scan.m_*) stay HOST-side: they are static
    # trace-time structure for the ragged concat, not device streams
    scan = {k[len("scan."):]: (np.asarray(z[k])
                               if k.startswith("scan.m_") else dput(z[k]))
            for k in z.files if k.startswith("scan.")}
    reduce = {k[len("reduce."):]: dput(z[k]) for k in z.files
              if k.startswith("reduce.")}
    for k, v in scalars.items():
        if k.startswith("scan."):
            scan[k[len("scan."):]] = v
        elif k.startswith("gather."):
            gather[k[len("gather."):]] = v
        elif k.startswith("reduce."):
            reduce[k[len("reduce."):]] = v

    return StreamPlan(
        n_gather_tiles=scalars["n_gather_tiles"],
        n_final_tiles=scalars["n_final_tiles"],
        layers=scalars["layers"],
        x_rows_pad=scalars["x_rows_pad"],
        hot_cols=jnp.asarray(z["hot_cols"]),
        gather=gather,
        shuffle=plan_sh,
        shuffle_dev=shuffle_device_arrays(plan_sh),
        scan=scan,
        n_y_blocks=scalars["n_y_blocks"],
        reduce=reduce or None,
    )


def stream_plan_cached(A: CSR, policy, cache_dir: str):
    """Fetch-or-build-or-load: the production entry point.

    Looks for `<cache_dir>/stream-<key>.npz`; on miss builds the plan
    and saves it before returning.
    """
    from spmv_tpu.kernels.stream import build_stream_plan

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"stream-{plan_key(A, policy)}.npz")
    if os.path.exists(path):
        try:
            return load_plan(path)
        except ValueError as e:  # stale format version: rebuild in place
            import sys

            print(f"plan cache {path}: {e}; rebuilding", file=sys.stderr)
    plan = build_stream_plan(A, policy)
    save_plan(plan, path)
    return plan
