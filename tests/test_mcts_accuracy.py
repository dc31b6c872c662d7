"""Multi-object physics-aware search accuracy regression.

VERDICT r1 item 6: a 3-object synthetic clutter scene (exact GT by
construction, real reference meshes, partial occlusion from an off-center
camera column) driven through the FULL estimate_pose(verification_mode=
"MCTS") path must recover every object within ADD-S < 2 cm. This locks the
round-1 "MCTS resolves LCP ambiguity (11.9 cm -> 0.8 cm)" claim in as a test.

Reference semantics being matched: UCTSearch.cpp:286-307 (search loop),
UCTState.cpp:93-116 (render cost), UCTState.cpp:208-270 (physics settle).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.config import (
    MCTSConfig, PhysicsConfig, PipelineConfig, PreprocessConfig, StoCSConfig,
)
from physimglobalpose_tpu.geometry import metrics
from physimglobalpose_tpu.models import assets, objectdb
from physimglobalpose_tpu.ops import raster_tri
from physimglobalpose_tpu.pipeline import api
from physimglobalpose_tpu.utils import synthdata

from tests.test_e2e_scene import MODELS, OBJ_CFG

OBJECTS = {  # name -> classId (obj_config.yml)
    "kleenex_tissue_box": 8,
    "expo_dry_erase_board_eraser": 2,
    "folgers_classic_roast_coffee": 3,
}

CFG = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=64, max_quads_per_base=32, max_pairs_per_ppf=128),
    physics=PhysicsConfig(steps=30),
    mcts=MCTSConfig(branching=4, leaf_batch=8, max_search_seconds=120.0),
    max_model_points=512,
    max_validation_points=1024,
)

INTR = np.array(
    [[613.998, 0.0, 320.0], [0.0, 613.998, 240.0], [0.0, 0.0, 1.0]], np.float32
)
H, W = 480, 640
TABLE_DEPTH = 0.8  # camera 1.5 m up, table surface at world z = 0.7


@pytest.fixture(scope="module")
def db():
    return objectdb.load_object_db(
        OBJ_CFG, MODELS, config=CFG, cache_dir="/tmp/ppf_cache",
        only=list(OBJECTS),
    )


def _resting_pose(mesh, yaw_deg, xy):
    """Camera-frame pose: yaw about the view axis, resting on the table."""
    rot = Rotation.from_euler("z", yaw_deg, degrees=True).as_matrix().astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    z_max = float((mesh.vertices @ rot.T)[:, 2].max())
    pose[:3, 3] = [xy[0], xy[1], TABLE_DEPTH - z_max - 0.001]
    return pose


@pytest.fixture(scope="module")
def clutter_scene(db, tmp_path_factory):
    """Write a 3-object APC-layout scene with exact GT poses."""
    sd = str(tmp_path_factory.mktemp("clutter") / "scene_0000")
    os.makedirs(sd, exist_ok=True)
    # Cluster offset from the image center so view rays slant: the tall
    # kleenex box (13 cm) casts a view shadow over the coffee can behind it.
    # Footprints (kleenex .11x.11, expo .13x.055, folgers .14x.10) do NOT
    # physically overlap - occlusion is at the silhouette level only.
    placements = {
        "kleenex_tissue_box": (25.0, (0.20, 0.03)),
        "expo_dry_erase_board_eraser": (-40.0, (0.16, -0.12)),
        "folgers_classic_roast_coffee": (5.0, (0.345, -0.02)),
    }
    poses_cam = {}
    depths = []
    class_of = []
    for name, (yaw, xy) in placements.items():
        mesh = assets.decimate_to_max_faces(db[name].mesh, 3000)
        pose = _resting_pose(mesh, yaw, xy)
        poses_cam[name] = pose
        depths.append(
            np.asarray(
                raster_tri.render_mesh_depth(
                    jnp.asarray(pose), jnp.asarray(mesh.vertices),
                    jnp.asarray(mesh.faces), jnp.ones(len(mesh.faces), bool),
                    jnp.asarray(INTR), H, W,
                )
            )
        )
        class_of.append(OBJECTS[name])
    stack = np.stack(depths)  # [3, H, W]
    stack_inf = np.where(stack > 0, stack, np.inf)
    owner = np.argmin(stack_inf, axis=0)
    any_obj = np.isfinite(stack_inf.min(axis=0))
    depth = np.where(any_obj, stack_inf.min(axis=0), TABLE_DEPTH).astype(np.float32)
    mask = np.where(any_obj, np.asarray(class_of)[owner], 0).astype(np.int32)
    occluded = (stack > 0).sum(axis=0) > 1
    assert occluded.sum() > 200, "placements must produce real occlusion"

    color = np.zeros((H, W, 3), np.uint8)
    gt_world = synthdata.write_scene_dir(
        sd, color, depth, mask, INTR, poses_cam, table_depth=TABLE_DEPTH
    )
    return sd, gt_world


def test_mcts_clutter_scene_accuracy(db, clutter_scene, tmp_path):
    sd, gt_world = clutter_scene
    dbg_dir = str(tmp_path / "dbg")
    result = api.estimate_pose(
        sd, db, dataset="APC", segmentation_mode="GT",
        hypothesis_mode="PCS", verification_mode="MCTS",
        cfg=CFG, seed=0, write_result=False, debug_dir=dbg_dir,
    )
    assert len(result.objects) == 3
    # The final chosen assignment gets a reference-grade triangle-mesh
    # render in the debug dump (depth_sim parity; VERDICT r2 Next #4).
    mesh_render = os.path.join(dbg_dir, "final_assignment_mesh_render.png")
    assert os.path.exists(mesh_render)
    for est in result.objects:
        obj = db[est.name]
        adds = float(
            metrics.adds_error(
                jnp.asarray(est.pose_world.astype(np.float32)),
                jnp.asarray(gt_world[est.name].astype(np.float32)),
                jnp.asarray(obj.validation_pts[:512]),
            )
        )
        assert adds < 0.02, f"{est.name}: ADD-S {adds:.4f} m"
