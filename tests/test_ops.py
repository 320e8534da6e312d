"""Geometry op tests, including parity oracles against torch-equivalent math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shapegen_tpu import ops


def test_square_distance_matches_numpy(rng):
    src = rng.standard_normal((2, 17, 3)).astype(np.float32)
    dst = rng.standard_normal((2, 23, 3)).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.asarray(src), jnp.asarray(dst)))
    want = np.sum((src[:, :, None, :] - dst[:, None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points_rank2_and_rank3(rng):
    pts = rng.standard_normal((2, 10, 3)).astype(np.float32)
    idx2 = rng.integers(0, 10, (2, 4)).astype(np.int32)
    got2 = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx2)))
    for b in range(2):
        np.testing.assert_array_equal(got2[b], pts[b, idx2[b]])
    idx3 = rng.integers(0, 10, (2, 4, 5)).astype(np.int32)
    got3 = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx3)))
    for b in range(2):
        np.testing.assert_array_equal(got3[b], pts[b, idx3[b]])


def test_knn_matches_brute_force(rng):
    src = rng.standard_normal((1, 32, 3)).astype(np.float32)
    dst = rng.standard_normal((1, 48, 3)).astype(np.float32)
    d, idx = ops.knn(jnp.asarray(src), jnp.asarray(dst), k=3)
    full = np.sum((src[:, :, None, :] - dst[:, None, :, :]) ** 2, axis=-1)
    want_idx = np.argsort(full, axis=-1)[..., :3]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(full, want_idx, -1), atol=1e-4
    )


def test_fps_coverage_property(rng):
    # FPS must return distinct indices and spread points: for a point set of
    # two well-separated clusters, both clusters must be hit.
    a = rng.standard_normal((64, 3)).astype(np.float32) * 0.1
    b = rng.standard_normal((64, 3)).astype(np.float32) * 0.1 + 10.0
    xyz = jnp.asarray(np.concatenate([a, b])[None])
    idx = np.asarray(ops.farthest_point_sample(xyz, 8, deterministic_start=True))[0]
    assert len(set(idx.tolist())) == 8
    assert (idx < 64).any() and (idx >= 64).any()


def test_fps_matches_sequential_oracle(rng):
    xyz = rng.standard_normal((2, 40, 3)).astype(np.float32)
    got = np.asarray(
        ops.farthest_point_sample(jnp.asarray(xyz), 10, deterministic_start=True)
    )
    # Sequential numpy oracle of the same algorithm (utils.py:418-442).
    for b in range(2):
        pts = xyz[b]
        dist = np.full(40, 1e10)
        far = 0
        out = []
        for i in range(10):
            out.append(far)
            d = np.sum((pts - pts[far]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            far = int(np.argmax(dist))
        np.testing.assert_array_equal(got[b], out)


def test_voxelize_known_points():
    pts = jnp.array([[[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]])
    v = np.asarray(ops.voxelize(pts, 32))
    assert v.shape == (1, 32, 32, 32)
    assert v[0, 0, 0, 0] == 1.0
    assert v[0, 31, 31, 31] == 1.0
    # (0+1)*31/2 = 15.5 -> floor 15
    assert v[0, 15, 15, 15] == 1.0
    assert v.sum() == 3.0


def test_voxelize_out_of_range_clamped():
    pts = jnp.array([[[-2.0, 0.0, 0.0], [2.0, 0.0, 0.0]]])
    v = np.asarray(ops.voxelize(pts, 8))
    assert v[0, 0, 3, 3] == 1.0 and v[0, 7, 3, 3] == 1.0


def test_voxel_points_roundtrip():
    key = jax.random.PRNGKey(24)
    pts = jax.random.uniform(key, (2, 100, 3), minval=-0.9, maxval=0.9)
    v = ops.voxelize(pts, 32)
    out, mask, count = ops.voxel_to_points_padded(v, max_points=256, threshold=0.5)
    assert out.shape == (2, 256, 3)
    n_occ = np.asarray(v.sum(axis=(1, 2, 3))).astype(int)
    np.testing.assert_array_equal(np.asarray(count), n_occ)
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=-1)), n_occ)
    # Valid points normalized to [-1, 1]
    vals = np.asarray(out)[np.asarray(mask)]
    assert vals.min() >= -1.0 and vals.max() <= 1.0


def test_voxel_to_points_scan_order_and_column_order():
    # Single occupied cell at grid position (z=2, y=1, x=3) in a (4,4,4) grid.
    g = np.zeros((4, 4, 4), np.float32)
    g[2, 1, 3] = 1.0
    pts, mask, count = ops.voxel_to_points_padded(jnp.asarray(g), max_points=4)
    assert int(count) == 1
    # Columns are [x, y, z] normalized by [W-1, H-1, D-1] (utils.py:530-533).
    np.testing.assert_allclose(
        np.asarray(pts[0]), [2 * 3 / 3 - 1, 2 * 1 / 3 - 1, 2 * 2 / 3 - 1], rtol=1e-6
    )


def test_voxel_to_points_empty_grid():
    g = jnp.zeros((4, 4, 4))
    pts, mask, count = ops.voxel_to_points_padded(g, max_points=8)
    assert int(count) == 0 and not bool(mask.any())
    np.testing.assert_array_equal(np.asarray(pts), 0.0)


def test_normalize_to_cube_bounds(rng):
    pts = jnp.asarray(rng.standard_normal((3, 50, 3)).astype(np.float32) * 7 + 2)
    out = np.asarray(ops.normalize_to_cube(pts))
    assert np.abs(out).max() <= 1.0 + 1e-6
    # max+min centering: per-axis extremes symmetric
    for b in range(3):
        ext = out[b].max(0) + out[b].min(0)
        np.testing.assert_allclose(ext, 0.0, atol=1e-5)


def test_normalize_unit_sphere(rng):
    pts = jnp.asarray(rng.standard_normal((60, 3)).astype(np.float32) * 3 + 5)
    out = np.asarray(ops.normalize_unit_sphere(pts))
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1).max(), 1.0, rtol=1e-5)


def test_masked_normalize_matches_unmasked_on_full(rng):
    pts = jnp.asarray(rng.standard_normal((40, 3)).astype(np.float32))
    mask = jnp.ones((40,), bool)
    a = np.asarray(ops.normalize_unit_sphere(pts))
    b = np.asarray(ops.masked_normalize_unit_sphere(pts, mask))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_masked_normalize_ignores_padding(rng):
    valid = rng.standard_normal((30, 3)).astype(np.float32) + 4
    padded = np.concatenate([valid, np.zeros((10, 3), np.float32)])
    mask = np.concatenate([np.ones(30, bool), np.zeros(10, bool)])
    out = np.asarray(
        ops.masked_normalize_unit_sphere(jnp.asarray(padded), jnp.asarray(mask))
    )
    want = np.asarray(ops.normalize_unit_sphere(jnp.asarray(valid)))
    np.testing.assert_allclose(out[:30], want, atol=1e-5)
    np.testing.assert_array_equal(out[30:], 0.0)


def test_sample_to_fixed_size_downsample(rng):
    pts = jnp.asarray(rng.standard_normal((100, 3)).astype(np.float32))
    mask = jnp.ones((100,), bool)
    out = ops.sample_to_fixed_size(jax.random.PRNGKey(0), pts, mask, 32)
    assert out.shape == (32, 3)
    # Without replacement: all rows distinct
    assert len({tuple(r) for r in np.asarray(out).tolist()}) == 32


def test_sample_to_fixed_size_upsample_uses_all_valid(rng):
    pts = np.zeros((64, 3), np.float32)
    pts[:10] = rng.standard_normal((10, 3))
    mask = np.zeros(64, bool)
    mask[:10] = True
    out = np.asarray(
        ops.sample_to_fixed_size(jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(mask), 25)
    )
    assert out.shape == (25, 3)
    got_rows = {tuple(r) for r in out.tolist()}
    want_rows = {tuple(r) for r in pts[:10].tolist()}
    assert got_rows == want_rows  # every valid point appears; only valid points


def test_rotation_preserves_norms_and_y(rng):
    pts = jnp.asarray(rng.standard_normal((50, 3)).astype(np.float32))
    out = ops.rotate_around_y(jax.random.PRNGKey(7), pts)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(pts), axis=-1),
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(out)[:, 1], np.asarray(pts)[:, 1], atol=1e-6)


def test_jitter_bounded(rng):
    pts = jnp.zeros((100, 3))
    out = np.asarray(ops.jitter_points(jax.random.PRNGKey(3), pts))
    assert np.abs(out).max() <= 0.05 + 1e-7


def test_dilate_voxels_matches_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(0)
    g = (rng.random((16, 16, 16)) > 0.95).astype(np.float32)
    got = np.asarray(ops.dilate_voxels(jnp.asarray(g)))
    want = ndimage.maximum_filter(g, size=3)
    np.testing.assert_array_equal(got, want)


def test_point_cloud_to_voxel_rounds():
    # utils.py:117 rounds instead of truncating.
    pts = jnp.array([[0.0, 0.0, 0.0]])  # scaled: 15.5 -> round 16 (banker's: 16)
    v = np.asarray(ops.point_cloud_to_voxel(pts, dims=32, dilate=False))
    assert v[16, 16, 16] == 1.0
