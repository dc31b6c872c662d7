"""Voxel-grid downsampling with static shapes.

Replaces PCL VoxelGrid (reference SceneCfg.cpp:47-52 at 5 mm for the scene,
Segmentation.cpp:234-238 at 1 cm for segments). PCL outputs the centroid of
the points in each occupied voxel; we reproduce that with a sort +
segment-mean formulation that XLA compiles to fixed-shape ops.

Output is a fixed-size buffer: one representative per occupied voxel,
compacted to the front, padded with zeros + a validity mask.
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp


def voxel_ids(points: jnp.ndarray, mask: jnp.ndarray, voxel: float) -> jnp.ndarray:
    """Integer voxel key per point (invalid points get the max key).

    Keys pack 3x10 bits (int32-safe without x64): valid for coordinates within
    +-512 voxels of the origin (e.g. +-2.56 m at 5 mm), which covers the
    reference's 0.1-2.0 m depth-clipped scenes; out-of-range coords clamp.
    """
    ijk = jnp.clip(jnp.floor(points / voxel).astype(jnp.int32) + 512, 0, 1023)
    key = (ijk[..., 0] * 1024 + ijk[..., 1]) * 1024 + ijk[..., 2]
    return jnp.where(mask, key, jnp.int32(2**30))


def voxel_downsample(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    voxel: float,
    max_out: int,
    extras: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray | None]:
    """Centroid-per-voxel downsample.

    Args:
      points: [N, 3]; mask: [N] bool; voxel: edge length (m).
      max_out: static output size.
      extras: optional [N, C] per-point attributes averaged alongside.
    Returns:
      (out [max_out, 3], out_mask [max_out], out_extras [max_out, C] | None)
    """
    n = points.shape[0]
    keys = voxel_ids(points, mask, voxel)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    pts_s = points[order]
    valid_s = mask[order]

    # Segment boundaries: first occurrence of each key.
    is_first = jnp.concatenate([jnp.array([True]), keys_s[1:] != keys_s[:-1]])
    is_first = is_first & valid_s
    # Segment id per point = running count of firsts - 1.
    seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, max_out)  # invalid -> overflow bucket

    num_seg = max_out + 1
    counts = jnp.zeros(num_seg, jnp.float32).at[seg].add(jnp.where(valid_s, 1.0, 0.0))
    sums = jnp.zeros((num_seg, 3), jnp.float32).at[seg].add(
        jnp.where(valid_s[:, None], pts_s, 0.0)
    )
    denom = jnp.maximum(counts, 1.0)[:, None]
    cent = (sums / denom)[:max_out]
    out_mask = counts[:max_out] > 0

    out_extras = None
    if extras is not None:
        ex_s = extras[order]
        ex_sums = jnp.zeros((num_seg, extras.shape[-1]), jnp.float32).at[seg].add(
            jnp.where(valid_s[:, None], ex_s, 0.0)
        )
        out_extras = (ex_sums / denom)[:max_out]
        out_extras = jnp.where(out_mask[:, None], out_extras, 0.0)

    cent = jnp.where(out_mask[:, None], cent, 0.0)
    return cent, out_mask, out_extras
