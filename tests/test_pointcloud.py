import jax
import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.geometry import pointcloud

K = np.array(
    [[613.998108, 0.0, 322.453583], [0.0, 613.998169, 239.67894], [0.0, 0.0, 1.0]],
    dtype=np.float32,
)


def numpy_backproject(depth, k):
    # Oracle re-derivation of utilities.cpp:141-150.
    h, w = depth.shape
    pts = np.zeros((h, w, 3), np.float32)
    valid = np.zeros((h, w), bool)
    for u in range(h):
        for v in range(w):
            d = depth[u, v]
            if 0.1 < d < 2.0:
                pts[u, v] = [(v - k[0, 2]) * d / k[0, 0], (u - k[1, 2]) * d / k[1, 1], d]
                valid[u, v] = True
    return pts, valid


def test_backproject_matches_oracle(rng):
    depth = rng.uniform(0.0, 2.5, size=(12, 16)).astype(np.float32)
    want_pts, want_valid = numpy_backproject(depth, K)
    got_pts, got_valid = pointcloud.backproject(jnp.asarray(depth), jnp.asarray(K))
    np.testing.assert_array_equal(np.asarray(got_valid), want_valid)
    np.testing.assert_allclose(np.asarray(got_pts), want_pts, atol=1e-5)


def test_project_roundtrip(rng):
    depth = rng.uniform(0.3, 1.5, size=(480, 640)).astype(np.float32)
    pts, valid = pointcloud.backproject(jnp.asarray(depth), jnp.asarray(K))
    reproj = pointcloud.project_zmin(
        pts.reshape(-1, 3), valid.reshape(-1), jnp.asarray(K), 480, 640
    )
    got = np.asarray(reproj)
    # Interior pixels round-trip exactly (boundary rows/cols excluded by the
    # reference's exclusive-low bounds).
    interior = np.zeros_like(got, bool)
    interior[1:, 1:] = True
    match = np.isclose(got[interior], depth[interior], atol=1e-4)
    assert match.mean() > 0.99


def test_project_zmin_keeps_nearest():
    # Two points projecting to the same pixel: z-min wins (utilities.cpp:241).
    pts = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.5]])
    valid = jnp.array([True, True])
    depth = pointcloud.project_zmin(pts, valid, jnp.asarray(K), 480, 640)
    row, col = int(round(float(K[1, 2]))), int(round(float(K[0, 2])))
    assert np.isclose(float(depth[row, col]), 0.5)


def test_compact_masked_points():
    pts = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
    mask = jnp.array([True, False, True, False, True, False, False, False, True, False])
    out, out_mask = pointcloud.compact_masked_points(pts, mask, 6)
    assert int(out_mask.sum()) == 4
    got_rows = np.asarray(out)[np.asarray(out_mask)]
    want_rows = np.asarray(pts)[np.asarray(mask)]
    np.testing.assert_array_equal(np.sort(got_rows, axis=0), np.sort(want_rows, axis=0))


def test_compact_overflow_subsamples():
    pts = jnp.ones((100, 3))
    mask = jnp.ones(100, bool)
    out, out_mask = pointcloud.compact_masked_points(pts, mask, 16, key=jax.random.key(0))
    assert bool(out_mask.all())


def test_crop_segment(rng):
    depth = rng.uniform(0.3, 1.5, size=(48, 64)).astype(np.float32)
    prob = np.zeros((48, 64), np.float32)
    prob[10:20, 10:20] = 0.9
    pts, probs, mask = pointcloud.crop_segment(
        jnp.asarray(depth), jnp.asarray(prob), jnp.asarray(K), max_points=256
    )
    assert pts.shape == (256, 3)
    assert int(mask.sum()) == 100
    valid_probs = np.asarray(probs)[np.asarray(mask)]
    np.testing.assert_allclose(valid_probs, 0.9, atol=1e-6)
