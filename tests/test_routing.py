"""Tests for the 3-stage tile routing planner (ops/routing.py)."""

import numpy as np
import pytest

from spmv_tpu.ops.routing import apply_routes_np, route_tiles, route_tiles_py


def _check(src, planner):
    T = src.shape[0]
    s1, s2, s3 = planner(src)
    tiles = np.arange(T * 128 * 128, dtype=np.float32).reshape(T, 128, 128)
    out = apply_routes_np(tiles, s1, s2, s3)
    flat = tiles.reshape(T, -1)
    for t in range(T):
        live = src[t] >= 0
        want = flat[t][np.where(live, src[t], 0)]
        np.testing.assert_array_equal(out[t][live], want[live])


def test_identity_py():
    src = np.arange(128 * 128, dtype=np.int32).reshape(1, 128, 128)
    _check(src, route_tiles_py)


def test_random_permutation_py():
    rng = np.random.default_rng(0)
    src = np.stack([rng.permutation(128 * 128).astype(np.int32)
                    .reshape(128, 128) for _ in range(2)])
    _check(src, route_tiles_py)


def test_permutation_with_dontcare_py():
    rng = np.random.default_rng(1)
    p = rng.permutation(128 * 128).astype(np.int32)
    p[rng.permutation(128 * 128)[:5000]] = -1
    _check(p.reshape(1, 128, 128), route_tiles_py)


def test_duplicating_gather_py():
    # identical (r1,c1,r2) triples must dedupe and share one color:
    # several out rows each broadcast-read a single source slot.
    rng = np.random.default_rng(2)
    src = rng.permutation(128 * 128).astype(np.int32).reshape(128, 128)
    for r2 in range(10):
        src[r2, :] = int(rng.integers(0, 128 * 128))
    _check(src[None], route_tiles_py)


def test_native_matches_python():
    from spmv_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    src = np.stack([rng.permutation(128 * 128).astype(np.int32)
                    .reshape(128, 128) for _ in range(4)])
    src[0, 3, :17] = -1
    _check(src, route_tiles)  # native path
    _check(src, route_tiles_py)


def test_native_many_tiles_fast():
    from spmv_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    T = 32
    src = np.stack([rng.permutation(128 * 128).astype(np.int32)
                    .reshape(128, 128) for _ in range(T)])
    _check(src, native.route_tiles)


def test_out_of_range_raises():
    src = np.zeros((1, 128, 128), dtype=np.int32)
    src[0, 0, 0] = 128 * 128  # out of range
    with pytest.raises(ValueError):
        route_tiles(src)


def test_degree_overflow_raises():
    # A source row with >128 distinct (c1, r2) flows is rejected (the
    # planner's Konig model needs deduped degrees <= 128): out rows
    # 0..127 each read two distinct columns of source row 0.
    rng = np.random.default_rng(5)
    src = rng.permutation(128 * 128).astype(np.int32).reshape(128, 128)
    for r2 in range(128):
        src[r2, 0] = (2 * r2) % 128       # source row 0, two distinct
        src[r2, 1] = (2 * r2 + 1) % 128   # columns per destination row
    with pytest.raises(ValueError):
        route_tiles_py(src[None])
