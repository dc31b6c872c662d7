"""Depth <-> point cloud conversions as fused XLA ops.

Reference semantics (utilities.cpp:125-244): back-projection keeps pixels
with depth in (0.1, 2.0) m; x = (col - cx) d / fx, y = (row - cy) d / fy,
z = d. Projection (convert2d, :233-244) does a z-min composite into the
depth buffer with col = floor(px/pz), row = floor(py/pz) and the reference's
exclusive-low bounds checks.

TPU design: everything is dense, organized [H, W] maps with validity masks —
no dynamic-length clouds. "Unorganized" extraction to a fixed-size buffer is
provided for the segment path via top-k compaction.
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp


def backproject(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    depth_min: float = 0.1,
    depth_max: float = 2.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Organized back-projection.

    Args:
      depth: [H, W] meters.
      intrinsics: [3, 3] camera matrix.
    Returns:
      points: [H, W, 3] camera-frame points (0 where invalid).
      valid: [H, W] bool mask (depth in (depth_min, depth_max)).
    """
    h, w = depth.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    valid = (depth > depth_min) & (depth < depth_max)
    d = jnp.where(valid, depth, 0.0)
    x = (cols - cx) * d / fx
    y = (rows - cy) * d / fy
    points = jnp.stack([x, y, d], axis=-1)
    return points, valid


def project_zmin(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Project points into a depth map with z-min compositing (convert2d).

    Args:
      points: [N, 3] camera-frame points.
      valid: [N] bool.
    Returns:
      depth: [height, width] float32, 0 where nothing projects.
    """
    px = points @ intrinsics.T  # [N, 3]
    z = px[:, 2]
    # Round to nearest pixel: the exact inverse of backproject's pixel-center
    # convention. (The reference truncates via C int casts, utilities.cpp:240,
    # introducing a half-pixel bias - deliberate fix.)
    col = jnp.floor(px[:, 0] / jnp.where(z == 0, 1.0, z) + 0.5).astype(jnp.int32)
    row = jnp.floor(px[:, 1] / jnp.where(z == 0, 1.0, z) + 0.5).astype(jnp.int32)
    # Reference bounds are exclusive-low (utilities.cpp:240).
    inb = (row > 0) & (row < height) & (col > 0) & (col < width) & valid & (z > 0)
    flat = jnp.where(inb, row * width + col, height * width)  # overflow bucket
    buf = jnp.full((height * width + 1,), jnp.inf, dtype=jnp.float32)
    buf = buf.at[flat].min(jnp.where(inb, z, jnp.inf))
    depth = buf[:-1].reshape(height, width)
    return jnp.where(jnp.isinf(depth), 0.0, depth)


def compact_mask_indices(
    mask: jnp.ndarray, max_points: int, key: jax.Array | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of up to max_points True entries of mask, padded.

    The TPU replacement for dynamic-length clouds: if more than max_points
    entries are valid, a uniform random subset is kept (pass key), else the
    first max_points in scan order.

    Returns (idx [max_points] int32, out_mask [max_points] bool).
    """
    m = mask.shape[0]
    if key is not None:
        priority = jnp.where(mask, jax.random.uniform(key, (m,)), 2.0)
    else:
        priority = jnp.where(mask, jnp.linspace(0.0, 1.0, m), 2.0)
    _, idx = jax.lax.top_k(-priority, max_points)
    return idx, mask[idx]


def compact_masked_points(
    points: jnp.ndarray, mask: jnp.ndarray, max_points: int, key: jax.Array | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extract up to max_points points where mask is True into a fixed buffer.

    Args:
      points: [M, 3] (flattened organized map).
      mask: [M] bool.
    Returns:
      out: [max_points, 3]; out_mask: [max_points] bool.
    """
    idx, out_mask = compact_mask_indices(mask, max_points, key)
    out = jnp.where(out_mask[:, None], points[idx], 0.0)
    return out, out_mask


def crop_segment(
    depth: jnp.ndarray,
    obj_prob: jnp.ndarray,
    intrinsics: jnp.ndarray,
    max_points: int,
    key: jax.Array | None = None,
    depth_min: float = 0.1,
    depth_max: float = 2.0,
    prob_threshold: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """mask x depth -> fixed-size segment cloud + per-point probability.

    Mirrors Segmentation::compute3dSegment's depth.mul(mask) -> cloud step
    (Segmentation.cpp:214-219), keeping the per-pixel probability attached
    (the StoCS prior, match4pcsBase.cc:316-340).

    Returns (points [max_points, 3], probs [max_points], mask [max_points]).
    """
    pts, valid = backproject(depth, intrinsics, depth_min, depth_max)
    sel = valid & (obj_prob > prob_threshold)
    flat_pts = pts.reshape(-1, 3)
    flat_sel = sel.reshape(-1)
    idx, out_mask = compact_mask_indices(flat_sel, max_points, key)
    out = jnp.where(out_mask[:, None], flat_pts[idx], 0.0)
    probs = jnp.where(out_mask, obj_prob.reshape(-1)[idx], 0.0)
    return out, probs, out_mask
