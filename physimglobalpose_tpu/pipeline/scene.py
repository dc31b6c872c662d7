"""Scene loading + table removal.

Reference: SceneCfg and its APC/YCB subclasses (SceneCfg.cpp:162-252) read
frame-000000.{color,depth}.png + gt_info.yml (camera pose/intrinsics, object
list); removeTable (SceneCfg.cpp:38-82) plane-fits the support surface and
zeroes its depth pixels. Here the scene is a host-side dataclass of numpy
arrays; the table removal is one jitted function (backproject -> voxel
downsample -> RANSAC plane -> depth zeroing).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
import numpy as np
import yaml

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.geometry import depthio, pointcloud
from physimglobalpose_tpu.ops import plane, voxel


@dataclasses.dataclass
class Scene:
    scene_dir: str
    dataset: str  # "APC" | "YCB"
    color: np.ndarray  # [H, W, 3] uint8
    depth: np.ndarray  # [H, W] float32 meters (raw, table not removed)
    intrinsics: np.ndarray  # [3, 3]
    cam_pose: np.ndarray  # [4, 4] camera-to-world
    object_names: List[str]
    class_mask: Optional[np.ndarray] = None  # [H, W] int32 GT class ids
    table_pose: Optional[np.ndarray] = None  # [4, 4] from gt_info rest_surface
    dependency_order: Optional[list] = None
    gt_poses: Optional[Dict[str, np.ndarray]] = None
    # De-rotated uint16 codec values (depth == raw16 / 10000 exactly) kept
    # from the PNG decode; batched sweeps upload these 2-byte values and
    # decode on device instead of re-encoding the float image per batch.
    depth_raw16: Optional[np.ndarray] = None


def _pose_from_tq(vals) -> np.ndarray:
    """gt_info.yml pose format: [x y z qw qx qy qz] (gt_info.yml:1).

    Pure numpy (mirrors se3.quat_to_matrix): load_scene runs per scene on the
    host, and every jax dispatch+fetch here costs a ~31 ms tunnel round trip
    on the axon backend — several per scene dominated sweep preprocessing.
    """
    t = np.asarray(vals[:3], np.float64)
    q = np.asarray(vals[3:7], np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )
    pose[:3, 3] = t.astype(np.float32)
    return pose


def load_scene(
    scene_dir: str,
    dataset: str = "APC",
    frame: str = "frame-000000",
    load_color: bool = True,
) -> Scene:
    """Load a reference-layout scene directory.

    load_color=False skips the color PNG decode (the largest host decode);
    GT-segmentation sweeps never read it.
    """
    with open(os.path.join(scene_dir, "gt_info.yml")) as fh:
        info = yaml.safe_load(fh)
    cam = info["camera"]
    intr = np.asarray(cam["camera_intrinsics"], np.float32)
    cam_pose = _pose_from_tq(cam["camera_pose"])
    color = (
        depthio.read_color_png(os.path.join(scene_dir, f"{frame}.color.png"))
        if load_color
        else None
    )
    depth_raw16 = depthio.read_depth_png_raw(
        os.path.join(scene_dir, f"{frame}.depth.png"), bit_rotated=(dataset == "APC")
    )
    depth = depth_raw16.astype(np.float32) / depthio.DEPTH_SCALE
    mask_path = os.path.join(scene_dir, f"{frame}.mask.png")
    class_mask = depthio.read_class_mask_png(mask_path) if os.path.exists(mask_path) else None

    sc = info.get("scene", {})
    n_obj = int(sc.get("num_objects", 0))
    names = [sc[f"object_{i}"]["name"] for i in range(1, n_obj + 1)]
    gt_poses = None
    if n_obj and "pose" in sc.get("object_1", {}):
        gt_poses = {
            sc[f"object_{i}"]["name"]: _pose_from_tq(sc[f"object_{i}"]["pose"])
            for i in range(1, n_obj + 1)
        }

    table_pose = None
    rest = info.get("rest_surface")
    if rest and "surface_pose" in rest:
        table_pose = _pose_from_tq(rest["surface_pose"])

    return Scene(
        scene_dir=scene_dir,
        dataset=dataset,
        color=color,
        depth=depth,
        intrinsics=intr,
        cam_pose=cam_pose,
        object_names=names,
        class_mask=class_mask,
        table_pose=table_pose,
        dependency_order=sc.get("dependency_order"),
        gt_poses=gt_poses,
        depth_raw16=depth_raw16,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def remove_table(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    key: jax.Array,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused table removal (SceneCfg.cpp:38-82 semantics).

    Returns (cleaned depth [H, W], plane [4], table_pose [4, 4]).
    """
    pre = cfg.preprocess
    pts, valid = pointcloud.backproject(depth, intrinsics, pre.depth_min, pre.depth_max)
    flat_pts = pts.reshape(-1, 3)
    flat_valid = valid.reshape(-1)
    # 5 mm voxel thinning before the plane fit (SceneCfg.cpp:47-52).
    k1, k2 = jax.random.split(key)
    sub, sub_mask = pointcloud.compact_masked_points(flat_pts, flat_valid, 16384, k1)
    vox, vox_mask, _ = voxel.voxel_downsample(sub, sub_mask, pre.scene_voxel, 8192)
    pl4, inliers = plane.fit_plane_ransac(
        vox, vox_mask, k2, threshold=pre.plane_dist_threshold, iters=pre.plane_ransac_iters
    )
    # Orient the plane normal toward the camera (-z side) for a stable frame.
    pl4 = jnp.where(pl4[2] > 0, -pl4, pl4)
    cleaned = plane.remove_table_depth(depth, pts, valid, pl4, pre.plane_dist_threshold)
    anchor = jnp.sum(jnp.where(inliers[:, None], vox, 0.0), axis=0) / jnp.maximum(
        jnp.sum(inliers), 1
    )
    tpose = plane.table_pose_from_plane(pl4, anchor)
    return cleaned, pl4, tpose


@functools.partial(jax.jit, static_argnames=("cfg",))
def refine_table_pose_from_depth(
    depth: jnp.ndarray,
    intrinsics: jnp.ndarray,
    plane4: jnp.ndarray,
    table_pose: jnp.ndarray,
    key: jax.Array,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """getTableParams parity (SceneCfg.cpp:87-157): ICP-refine the table
    frame against the raw depth's plane-inlier points (camera frame)."""
    pre = cfg.preprocess
    pts, valid = pointcloud.backproject(depth, intrinsics, pre.depth_min, pre.depth_max)
    flat_pts = pts.reshape(-1, 3)
    flat_valid = valid.reshape(-1)
    dist = jnp.abs(flat_pts @ plane4[:3] + plane4[3])
    inl = flat_valid & (dist < pre.plane_dist_threshold)
    sub, sub_mask = pointcloud.compact_masked_points(flat_pts, inl, 4096, key)
    return plane.refine_table_pose(
        table_pose, sub, sub_mask, plane4, cfg.physics.table_half_extents,
        threshold=pre.plane_dist_threshold,
    )


def scene_from_arrays(
    color: np.ndarray,
    depth: np.ndarray,
    intrinsics: np.ndarray,
    cam_pose: np.ndarray,
    object_names: List[str],
    dataset: str = "CAM",
    class_mask: Optional[np.ndarray] = None,
    table_pose: Optional[np.ndarray] = None,
) -> Scene:
    """Build a Scene from in-memory arrays (live-capture path).

    The analogue of CAMSceneCfg (SceneCfg.cpp:254-318), which grabs
    /rgb/image + /depth/image ROS topics; any capture source that yields
    registered RGB-D arrays plugs in here.
    """
    return Scene(
        scene_dir="<memory>",
        dataset=dataset,
        color=np.asarray(color),
        depth=np.asarray(depth, np.float32),
        intrinsics=np.asarray(intrinsics, np.float32),
        cam_pose=np.asarray(cam_pose, np.float32),
        object_names=list(object_names),
        class_mask=None if class_mask is None else np.asarray(class_mask, np.int32),
        table_pose=None if table_pose is None else np.asarray(table_pose, np.float32),
    )
