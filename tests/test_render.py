import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.ops import cost, raster

K = np.array([[300.0, 0, 64], [0, 300.0, 48], [0, 0, 1]], dtype=np.float32)
H, W = 96, 128


def grid_points_on_plane(z=0.6, half=0.04, n=24):
    xs = np.linspace(-half, half, n)
    ys = np.linspace(-half, half, n)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z)], axis=1)
    return pts.astype(np.float32)


def test_splat_renders_square():
    pts = grid_points_on_plane()
    depth = np.asarray(
        raster.splat_depth(jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(K), H, W, radius=1)
    )
    occupied = depth > 0
    assert occupied.sum() > 300  # a filled square patch
    np.testing.assert_allclose(depth[occupied], 0.6, atol=1e-5)
    # Patch should be centered near the principal point.
    rows, cols = np.where(occupied)
    assert abs(rows.mean() - 48) < 3 and abs(cols.mean() - 64) < 3


def test_zmin_between_two_planes():
    near = grid_points_on_plane(z=0.5)
    far = grid_points_on_plane(z=0.9)
    pts = np.concatenate([far, near])
    depth = np.asarray(
        raster.splat_depth(jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(K), H, W, radius=1)
    )
    occ = depth > 0
    np.testing.assert_allclose(depth[occ], 0.5, atol=1e-5)


def test_max_depth_clamp():
    pts = grid_points_on_plane(z=1.5)
    depth = np.asarray(
        raster.render_object_depth(
            jnp.eye(4), jnp.asarray(pts), jnp.ones(len(pts), bool),
            jnp.asarray(K), H, W, max_depth=1.0,
        )
    )
    assert (depth == 0).all()  # everything clamped (renderScene.cpp:70)


def test_composite_min():
    a = jnp.array([[0.0, 0.5], [0.7, 0.0]])
    b = jnp.array([[0.3, 0.0], [0.6, 0.0]])
    out = np.asarray(raster.composite_min(a, b))
    np.testing.assert_allclose(out, [[0.3, 0.5], [0.6, 0.0]])


def test_render_cost_semantics():
    # Oracle re-derivation of UCTState::computeCost (UCTState.cpp:93-116).
    obs = np.zeros((4, 4), np.float32)
    ren = np.zeros((4, 4), np.float32)
    obs[0, 0] = 0.5  # observed only -> obScore 1
    ren[1, 1] = 0.5  # rendered only -> renScore 1
    obs[2, 2] = 0.5  # both, agreeing -> no cost
    ren[2, 2] = 0.505
    obs[3, 3] = 0.5  # both, disagreeing -> ob+ren-int = 1
    ren[3, 3] = 0.8
    got = float(cost.render_cost(jnp.asarray(obs), jnp.asarray(ren), threshold=0.01))
    assert got == 3.0


def test_render_cost_batched():
    obs = np.random.default_rng(0).uniform(0.1, 1, size=(2, 8, 8)).astype(np.float32)
    ren = np.zeros_like(obs)
    out = np.asarray(cost.render_cost(jnp.asarray(obs), jnp.asarray(ren)))
    assert out.shape == (2,)
    np.testing.assert_allclose(out, (obs > 0).sum(axis=(1, 2)))


def test_pose_and_batch_render():
    pts = grid_points_on_plane(z=0.0)  # object-local plane at z=0
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 0.7
    poses = np.stack([pose, pose])
    poses[1][2, 3] = 0.4
    out = np.asarray(
        raster.render_objects_batch(
            jnp.asarray(poses), jnp.asarray(pts), jnp.ones(len(pts), bool),
            jnp.asarray(K), H, W,
        )
    )
    assert out.shape == (2, H, W)
    assert np.isclose(out[0][out[0] > 0].mean(), 0.7, atol=1e-4)
    assert np.isclose(out[1][out[1] > 0].mean(), 0.4, atol=1e-4)
    assert (out[1] > 0).sum() > (out[0] > 0).sum()  # nearer -> bigger
