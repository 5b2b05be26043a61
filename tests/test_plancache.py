"""Disk plan cache: save/load round-trip preserves stream results."""

import numpy as np

import jax.numpy as jnp

from spmv_tpu import spmv, spmv_ref
from spmv_tpu import config
from spmv_tpu.io.generate import power_law_csr


def test_stream_plan_roundtrip(tmp_path):
    from spmv_tpu.kernels import stream as st
    from spmv_tpu.utils.plancache import save_plan, load_plan

    A = power_law_csr(2000, 2000, 20000, alpha=1.5, seed=3)
    x = np.random.default_rng(0).standard_normal(2000).astype(np.float32)

    plan = st.build_stream_plan(A, st.DEFAULT_POLICY)
    p = str(tmp_path / "plan.npz")
    save_plan(plan, p)
    plan2 = load_plan(p)

    assert plan2.n_gather_tiles == plan.n_gather_tiles
    assert plan2.n_final_tiles == plan.n_final_tiles
    assert len(plan2.shuffle.passes) == len(plan.shuffle.passes)
    np.testing.assert_array_equal(
        np.asarray(plan2.scan["relid"]), np.asarray(plan.scan["relid"]))

    y1 = np.asarray(st._stream_spmv(A, jnp.asarray(x),
                                    st.PLUS_TIMES, st.DEFAULT_POLICY))
    # run through the loaded plan by injecting it into the plan cache
    from spmv_tpu.ops.registry import plan_cache
    A2 = power_law_csr(2000, 2000, 20000, alpha=1.5, seed=3)
    injected = plan_cache(A2, st.plan_cache_key(st.DEFAULT_POLICY),
                          lambda: plan2)
    assert injected is plan2
    y2 = np.asarray(st._stream_spmv(A2, jnp.asarray(x),
                                    st.PLUS_TIMES, st.DEFAULT_POLICY))
    np.testing.assert_array_equal(y1, y2)


def test_plan_dir_builds_then_hits(tmp_path, monkeypatch):
    monkeypatch.setenv("SPMV_TPU_PLAN_DIR", str(tmp_path))
    import os

    A = power_law_csr(1500, 1500, 12000, alpha=1.4, seed=5)
    x = np.random.default_rng(1).standard_normal(1500).astype(np.float32)
    y = np.asarray(spmv("stream", A, x))
    np.testing.assert_allclose(y, spmv_ref(A, x, np.float64),
                               rtol=2e-5, atol=1e-5)
    files = [f for f in os.listdir(tmp_path) if f.startswith("stream-")]
    assert len(files) == 1

    # a structurally identical fresh CSR object loads from disk and
    # produces the identical result
    import spmv_tpu.utils.plancache as pc

    called = []
    orig = pc.load_plan
    monkeypatch.setattr(pc, "load_plan",
                        lambda p: (called.append(p), orig(p))[1])
    A2 = power_law_csr(1500, 1500, 12000, alpha=1.4, seed=5)
    y2 = np.asarray(spmv("stream", A2, x))
    assert called, "second build did not hit the disk cache"
    np.testing.assert_array_equal(y, y2)


def test_scan_sbt_variants_share_plan(tmp_path, monkeypatch):
    """scan_sbt / scan_strategy are dispatch knobs: every variant runs
    off the SAME cached plan file (structural keying) and agrees."""
    import os

    import spmv_tpu.utils.plancache as pc
    from spmv_tpu.kernels import stream as st

    monkeypatch.setenv("SPMV_TPU_PLAN_DIR", str(tmp_path))
    A = power_law_csr(1500, 1500, 12000, alpha=1.4, seed=9)
    x = np.random.default_rng(2).standard_normal(1500).astype(np.float32)
    ys = []
    # v4 granule: any divisor of SBT_SCAN_MAX shares one plan (32 was
    # dropped when the full-rel-window scan outgrew its VMEM budget)
    for sbt in (8, 16):
        pol = st.StreamPolicy(scan_sbt=sbt)
        assert pc.plan_key(A, pol) == pc.plan_key(A, st.DEFAULT_POLICY)
        ys.append(np.asarray(st._stream_spmv(
            A, jnp.asarray(x), st.PLUS_TIMES, pol)))
    files = [f for f in os.listdir(tmp_path) if f.startswith("stream-")]
    assert len(files) == 1, files
    np.testing.assert_array_equal(ys[0], ys[1])


def test_stale_plan_version_rebuilds(tmp_path):
    """A plan file from an older format version is rebuilt in place,
    not fatal (forward-compat story for shipped plan caches)."""
    import pytest

    import spmv_tpu.utils.plancache as pc
    from spmv_tpu.kernels import stream as st

    A = power_law_csr(1500, 1500, 12000, alpha=1.4, seed=10)
    x = np.random.default_rng(3).standard_normal(1500).astype(np.float32)
    path = str(tmp_path / f"stream-{pc.plan_key(A, st.DEFAULT_POLICY)}.npz")
    plan = st.build_stream_plan(A, st.DEFAULT_POLICY)
    mp = pytest.MonkeyPatch()
    mp.setattr(pc, "_FORMAT_VERSION", 0)  # write a stale-version file
    pc.save_plan(plan, path)
    mp.undo()
    with pytest.raises(ValueError):
        pc.load_plan(path)

    plan2 = pc.stream_plan_cached(A, st.DEFAULT_POLICY, str(tmp_path))
    assert plan2.n_final_tiles == plan.n_final_tiles
    # the stale file was overwritten with the current version
    loaded = pc.load_plan(path)
    assert loaded.n_gather_tiles == plan.n_gather_tiles
    from spmv_tpu.ops.registry import plan_cache
    plan_cache(A, st.plan_cache_key(st.DEFAULT_POLICY), lambda: plan2)
    y = np.asarray(st._stream_spmv(A, jnp.asarray(x), st.PLUS_TIMES,
                                   st.DEFAULT_POLICY))
    np.testing.assert_allclose(y, spmv_ref(A, x, np.float64),
                               rtol=2e-5, atol=1e-5)
