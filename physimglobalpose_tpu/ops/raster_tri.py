"""Triangle-mesh depth rasterization (the quality render path).

The reference renders textured meshes through OpenGL FBOs
(depth_sim/renderScene.cpp); TPUs have no ROP hardware, so triangles
rasterize as math: per (face, pixel) screen-space edge-function coverage with
perspective-correct depth interpolation, streamed over pixel tiles (lax.scan)
so the [F, tile] blocks stay bounded. Face counts are bounded by
vertex-clustering decimation at asset-prep time
(models/assets.decimate_to_max_faces).

The point-splat path (ops/raster.py) remains the throughput choice for
search-time scoring; this rasterizer is for full-quality depth and
visualization.
"""

from __future__ import annotations

import functools

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("height", "width", "px_tile"))
def render_mesh_depth(
    pose: jnp.ndarray,  # [4, 4] camera-frame object pose
    vertices: jnp.ndarray,  # [V, 3] object-local
    faces: jnp.ndarray,  # [F, 3] int32
    face_mask: jnp.ndarray,  # [F] bool (padding)
    intrinsics: jnp.ndarray,  # [3, 3]
    height: int,
    width: int,
    px_tile: int = 4096,
) -> jnp.ndarray:
    """Rasterize a triangle mesh to a depth map [height, width] (0 = empty)."""
    v_cam = vertices @ pose[:3, :3].T + pose[:3, 3]  # [V, 3]
    z = v_cam[:, 2]
    safe_z = jnp.where(z <= 1e-6, 1.0, z)
    px = v_cam[:, 0] * intrinsics[0, 0] / safe_z + intrinsics[0, 2]
    py = v_cam[:, 1] * intrinsics[1, 1] / safe_z + intrinsics[1, 2]
    inv_z = jnp.where(z > 1e-6, 1.0 / safe_z, 0.0)

    fa, fb, fc = faces[:, 0], faces[:, 1], faces[:, 2]
    ax, ay, az = px[fa], py[fa], inv_z[fa]  # [F]
    bx, by, bz = px[fb], py[fb], inv_z[fb]
    cx, cy, cz = px[fc], py[fc], inv_z[fc]
    # Face valid: all three vertices in front of the camera.
    f_ok = face_mask & (z[fa] > 1e-6) & (z[fb] > 1e-6) & (z[fc] > 1e-6)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)  # 2x signed area
    f_ok = f_ok & (jnp.abs(area) > 1e-9)
    inv_area = jnp.where(f_ok, 1.0 / jnp.where(jnp.abs(area) < 1e-9, 1.0, area), 0.0)

    n_px = height * width
    pad = (-n_px) % px_tile
    n_tiles = (n_px + pad) // px_tile

    def tile_fn(carry, ti):
        flat0 = ti * px_tile
        idx = flat0 + jnp.arange(px_tile)
        pr = (idx // width).astype(jnp.float32)  # rows
        pc = (idx % width).astype(jnp.float32)  # cols

        # Barycentric weights via sub-triangle areas for every (face, pixel)
        # pair [F, T]; pixel screen coordinate is (x=col, y=row) = (pc, pr).
        l0 = ((bx[:, None] - pc[None]) * (cy[:, None] - pr[None])
              - (by[:, None] - pr[None]) * (cx[:, None] - pc[None])) * inv_area[:, None]
        l1 = ((cx[:, None] - pc[None]) * (ay[:, None] - pr[None])
              - (cy[:, None] - pr[None]) * (ax[:, None] - pc[None])) * inv_area[:, None]
        l2 = 1.0 - l0 - l1
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & f_ok[:, None]
        # Perspective-correct depth: interpolate 1/z.
        izp = l0 * az[:, None] + l1 * bz[:, None] + l2 * cz[:, None]
        depth = jnp.where(inside & (izp > 1e-9), 1.0 / jnp.maximum(izp, 1e-9), jnp.inf)
        tile_depth = jnp.min(depth, axis=0)  # [T]
        return carry, tile_depth

    _, tiles = jax.lax.scan(tile_fn, 0, jnp.arange(n_tiles))
    depth = tiles.reshape(-1)[:n_px].reshape(height, width)
    return jnp.where(jnp.isinf(depth), 0.0, depth)
