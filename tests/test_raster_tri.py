import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.models import assets
from physimglobalpose_tpu.ops import raster_tri

K = np.array([[200.0, 0, 40], [0, 200.0, 30], [0, 0, 1]], dtype=np.float32)
H, W = 60, 80


def test_single_triangle():
    # A big triangle facing the camera at z=0.5.
    verts = jnp.asarray([[-0.05, -0.05, 0.5], [0.05, -0.05, 0.5], [0.0, 0.08, 0.5]])
    faces = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    depth = np.asarray(
        raster_tri.render_mesh_depth(
            jnp.eye(4), verts, faces, jnp.ones(1, bool), jnp.asarray(K), H, W,
            px_tile=512,
        )
    )
    occ = depth > 0
    assert occ.sum() > 100
    np.testing.assert_allclose(depth[occ], 0.5, atol=1e-4)
    # Centroid of coverage near the projected triangle centroid.
    rows, cols = np.where(occ)
    assert abs(cols.mean() - 40) < 4
    # Outside the triangle: empty corners.
    assert depth[0, 0] == 0 and depth[-1, -1] == 0


def test_depth_interpolation_slanted():
    # A slanted quad: depth varies across the surface; nearest face wins.
    verts = jnp.asarray(
        [[-0.06, -0.06, 0.4], [0.06, -0.06, 0.6], [0.06, 0.06, 0.6], [-0.06, 0.06, 0.4]]
    )
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    depth = np.asarray(
        raster_tri.render_mesh_depth(
            jnp.eye(4), verts, faces, jnp.ones(2, bool), jnp.asarray(K), H, W,
            px_tile=512,
        )
    )
    occ = depth > 0
    assert 0.39 < depth[occ].min() < 0.45
    assert 0.55 < depth[occ].max() < 0.61


def test_mesh_render_matches_splat_coverage():
    # Render the kleenex box mesh; coverage should match a dense point splat.
    from physimglobalpose_tpu.ops import raster

    mesh = assets.load_mesh(
        "/root/reference/src/physim_pose_estimation/models_visualization/kleenex_tissue_box.ply"
    )
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    depth_tri = np.asarray(
        raster_tri.render_mesh_depth(
            jnp.asarray(pose), jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.ones(len(mesh.faces), bool), jnp.asarray(K), H, W, px_tile=512,
        )
    )
    pts, _ = assets.sample_surface(mesh, 4000)
    depth_splat = np.asarray(
        raster.render_object_depth(
            jnp.asarray(pose), jnp.asarray(pts), jnp.ones(len(pts), bool),
            jnp.asarray(K), H, W, radius=1,
        )
    )
    tri_occ = depth_tri > 0
    splat_occ = depth_splat > 0
    inter = (tri_occ & splat_occ).sum()
    union = (tri_occ | splat_occ).sum()
    assert inter / union > 0.8  # same silhouette
    both = tri_occ & splat_occ
    # The triangle raster returns the true nearest surface everywhere; the
    # splat's front-face holes leak back-surface points (its documented
    # weakness), so tri <= splat and they agree at most pixels.
    assert (depth_tri[both] <= depth_splat[both] + 0.01).all()
    agree = np.abs(depth_tri[both] - depth_splat[both]) < 0.01
    assert agree.mean() > 0.85


def test_decimation_bounds_faces():
    mesh = assets.load_mesh(
        "/root/reference/src/physim_pose_estimation/models_visualization/expo_dry_erase_board_eraser.ply"
    )
    assert len(mesh.faces) > 10000
    dec = assets.decimate_to_max_faces(mesh, 2000)
    assert len(dec.faces) <= 2000
    assert len(dec.faces) > 50
    # Extents preserved.
    e1 = mesh.vertices.max(0) - mesh.vertices.min(0)
    e2 = dec.vertices.max(0) - dec.vertices.min(0)
    np.testing.assert_allclose(e1, e2, rtol=0.15)
