"""Tests for the planned-permutation (shuffle) engine."""

import numpy as np
import pytest

from spmv_tpu.kernels.shuffle import (
    TILE,
    apply_shuffle,
    plan_shuffle,
    shuffle_device_arrays,
)


def _make_dst(rng, n_in_tiles, F, live_per_tile):
    """Random injective dst over F final tiles, ~live_per_tile each."""
    total = min(n_in_tiles * TILE, F * live_per_tile)
    # destination positions: for each final tile, `live_per_tile` slots
    dsts = (np.arange(F)[:, None] * TILE
            + np.arange(live_per_tile)[None, :]).reshape(-1)[:total]
    rng.shuffle(dsts)
    dst_pos = np.full(n_in_tiles * TILE, -1, dtype=np.int64)
    live_slots = rng.permutation(n_in_tiles * TILE)[:total]
    dst_pos[live_slots] = dsts
    return dst_pos


def _run_and_check(dst_pos, F, G, sbt, q1):
    import jax.numpy as jnp

    plan = plan_shuffle(dst_pos, F, G, sbt=sbt, q1=q1)
    rng = np.random.default_rng(7)
    data = rng.standard_normal(dst_pos.shape[0]).astype(np.float32)
    dev = shuffle_device_arrays(plan)
    out = np.asarray(
        apply_shuffle(jnp.asarray(data.reshape(-1, 128)), plan, dev)
    ).reshape(-1)
    live = dst_pos >= 0
    d = dst_pos[live]
    slots = plan.slot_of_dst[d]
    assert (slots >= 0).all(), "every requested destination must be placed"
    np.testing.assert_array_equal(out[slots], data[live])
    # injectivity of final slots
    assert np.unique(slots).size == slots.size


def test_shuffle_single_tile_regions():
    rng = np.random.default_rng(0)
    n_in_tiles, F = 16, 12
    dst = _make_dst(rng, n_in_tiles, F, live_per_tile=12500)
    _run_and_check(dst, F, G=12, sbt=1, q1=8)


def test_shuffle_multi_tile_steps():
    rng = np.random.default_rng(1)
    # sbt=2, 32 input tiles -> n_steps1=16, region_tiles=2, q2=64
    n_in_tiles, F = 32, 16
    dst = _make_dst(rng, n_in_tiles, F, live_per_tile=12000)
    _run_and_check(dst, F, G=8, sbt=2, q1=8)


def test_shuffle_sparse_input():
    rng = np.random.default_rng(2)
    n_in_tiles, F = 16, 4
    dst = _make_dst(rng, n_in_tiles, F, live_per_tile=8000)
    _run_and_check(dst, F, G=4, sbt=1, q1=8)


def test_quota_overflow_raises():
    # every element of one input tile heads to one final tile: count
    # 16384 in a q1-row window cannot fit when more groups share a tile
    rng = np.random.default_rng(3)
    n_in_tiles, F = 16, 12
    dst = _make_dst(rng, n_in_tiles, F, live_per_tile=12500)
    # concentrate: first input tile all -> final tile 0
    dst[:TILE] = np.arange(TILE) + 0  # dst tile 0 positions 0..16383
    with pytest.raises(ValueError, match="quota overflow|injective|range"):
        # duplicates also possible here; the planner must reject
        plan_shuffle(dst, F, 12, sbt=1, q1=8)


def test_geometry_validation():
    dst = np.full(TILE, -1, dtype=np.int64)
    with pytest.raises(ValueError):
        plan_shuffle(dst[: TILE - 128], 4, 2, sbt=1, q1=8)


def _run_and_check_multi(dst_pos, F, levels, sbt):
    import jax.numpy as jnp

    from spmv_tpu.kernels.shuffle import plan_shuffle_multi

    plan = plan_shuffle_multi(dst_pos, F, levels=levels, sbt=sbt)
    assert len(plan.passes) == len(levels) + 1
    rng = np.random.default_rng(7)
    data = rng.standard_normal(dst_pos.shape[0]).astype(np.float32)
    dev = shuffle_device_arrays(plan)
    out = np.asarray(
        apply_shuffle(jnp.asarray(data.reshape(-1, 128)), plan, dev)
    ).reshape(-1)
    live = dst_pos >= 0
    d = dst_pos[live]
    slots = plan.slot_of_dst[d]
    assert (slots >= 0).all()
    np.testing.assert_array_equal(out[slots], data[live])
    assert np.unique(slots).size == slots.size


def test_shuffle_three_level_four_pass():
    # the >60M-nnz reach path uses 3 explicit levels + final (4 passes);
    # exercise the same N-pass simulation/apply machinery at small size
    rng = np.random.default_rng(4)
    n_in_tiles, F = 8, 8
    dst = _make_dst(rng, n_in_tiles, F, live_per_tile=900)
    _run_and_check_multi(dst, F, levels=[(2, 16, 1), (2, 16, 1),
                                         (2, 16, 1)], sbt=1)


def test_shuffle_two_level_three_pass():
    rng = np.random.default_rng(5)
    n_in_tiles, F = 8, 8
    dst = _make_dst(rng, n_in_tiles, F, live_per_tile=1800)
    _run_and_check_multi(dst, F, levels=[(2, 16, 1), (4, 16, 1)], sbt=1)
