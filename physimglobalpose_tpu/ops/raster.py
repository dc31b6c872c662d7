"""Batched depth rendering: point-splat z-min rasterization.

Reference: depth_sim renders each object's textured mesh through OpenGL FBOs
at 640x480 and clamps depth > 1 m to zero (renderScene.cpp:45-71); MCTS
states min-composite the newly added object's render over the parent state's
buffer (UCTState.cpp:62-68).

TPU design (no ROP hardware): transform the object's dense surface cloud,
project (pointcloud.project_zmin semantics) and scatter-min with a small
square splat footprint to close holes; vmapped over hypothesis/scene batches.
Rendering at a reduced scale is supported for search-time scoring (the cost
is a pixel count - scale-invariant up to the factor). A triangle rasterizer
can replace the splat path later without changing callers.
"""

from __future__ import annotations

import functools

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("height", "width", "radius"))
def splat_depth(
    points: jnp.ndarray,  # [N, 3] camera-frame
    valid: jnp.ndarray,  # [N] bool
    intrinsics: jnp.ndarray,  # [3, 3]
    height: int,
    width: int,
    radius: int = 1,
) -> jnp.ndarray:
    """Project points and z-min scatter with a (2r+1)^2 splat. Returns [H, W]."""
    px = points @ intrinsics.T
    z = px[:, 2]
    safe_z = jnp.where(z == 0, 1.0, z)
    col = jnp.floor(px[:, 0] / safe_z + 0.5).astype(jnp.int32)
    row = jnp.floor(px[:, 1] / safe_z + 0.5).astype(jnp.int32)
    ok = valid & (z > 0)

    buf = jnp.full((height * width + 1,), jnp.inf, dtype=jnp.float32)
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            r = row + dr
            c = col + dc
            inb = ok & (r >= 0) & (r < height) & (c >= 0) & (c < width)
            flat = jnp.where(inb, r * width + c, height * width)
            buf = buf.at[flat].min(jnp.where(inb, z, jnp.inf))
    depth = buf[:-1].reshape(height, width)
    return jnp.where(jnp.isinf(depth), 0.0, depth)


def render_object_depth(
    pose: jnp.ndarray,  # [4, 4] camera-frame object pose
    model_pts: jnp.ndarray,  # [N, 3]
    model_mask: jnp.ndarray,  # [N] bool
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    radius: int = 1,
    max_depth: float = 0.0,
) -> jnp.ndarray:
    """Render one object at one pose.

    max_depth > 0 clamps far depth to 0 like the reference's 1 m render clamp
    (renderScene.cpp:70); pass 0 to disable.
    """
    pts = model_pts @ pose[:3, :3].T + pose[:3, 3]
    depth = splat_depth(pts, model_mask, intrinsics, height, width, radius)
    if max_depth > 0:
        depth = jnp.where(depth > max_depth, 0.0, depth)
    return depth


def render_objects_batch(
    poses: jnp.ndarray,  # [B, 4, 4]
    model_pts: jnp.ndarray,
    model_mask: jnp.ndarray,
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    radius: int = 1,
    max_depth: float = 0.0,
) -> jnp.ndarray:
    """vmap over B poses of the same object -> [B, H, W]."""
    fn = functools.partial(
        render_object_depth,
        model_pts=model_pts,
        model_mask=model_mask,
        intrinsics=intrinsics,
        height=height,
        width=width,
        radius=radius,
        max_depth=max_depth,
    )
    return jax.vmap(fn)(poses)


def render_scene_depth(
    poses: jnp.ndarray,  # [K, 4, 4] camera-frame object poses
    model_pts: jnp.ndarray,  # [K, N, 3]
    model_mask: jnp.ndarray,  # [K, N] bool
    intrinsics: jnp.ndarray,
    height: int,
    width: int,
    radius: int = 1,
    max_depth: float = 0.0,
) -> jnp.ndarray:
    """Render ALL K objects in ONE scatter pass -> [H, W].

    Exactly equivalent to composite_min over per-object render_object_depth
    calls (scatter-min is associative), but K x fewer image-buffer passes -
    the MCTS leaf evaluator's render cost is scatter-bound (measured round
    3, scripts/profile_mcts.py).
    """
    pts = (
        jnp.einsum("kij,knj->kni", poses[:, :3, :3], model_pts)
        + poses[:, None, :3, 3]
    )
    depth = splat_depth(
        pts.reshape(-1, 3), model_mask.reshape(-1), intrinsics,
        height, width, radius,
    )
    if max_depth > 0:
        depth = jnp.where(depth > max_depth, 0.0, depth)
    return depth


def composite_min(depth_a: jnp.ndarray, depth_b: jnp.ndarray) -> jnp.ndarray:
    """Min-composite two depth maps where 0 means empty (UCTState.cpp:62-68)."""
    a_empty = depth_a == 0
    b_empty = depth_b == 0
    both = jnp.minimum(depth_a, depth_b)
    out = jnp.where(a_empty, depth_b, jnp.where(b_empty, depth_a, both))
    return out
