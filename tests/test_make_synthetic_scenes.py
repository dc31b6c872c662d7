"""Gate the synthetic-scene generator (the accuracy-artifact producer).

scripts/make_synthetic_scenes.py writes the scenes behind SYNTH_EVAL.json;
these tests check each layout mode round-trips through the real scene
loader with geometrically consistent ground truth: APC (bit-rotated depth
codec), YCB (plain millimeters), and --stack (the second object resting ON
the first - the dependency_order case).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from physimglobalpose_tpu.pipeline import scene as scene_mod

OBJ_CFG = ("/root/reference/src/physim_pose_estimation/src/data_layer/"
           "obj_config.yml")
OBJ_CFG_YCB = ("/root/reference/src/physim_pose_estimation/src/data_layer/"
               "obj_config_ycb.yml")
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
APC_OBJS = "kleenex_tissue_box,expo_dry_erase_board_eraser"
YCB_OBJS = "003_cracker_box,005_tomato_soup_can"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODELS), reason="reference model meshes not present"
)


def _generate(tmp_path, extra):
    import make_synthetic_scenes

    out = str(tmp_path / "scenes")
    make_synthetic_scenes.main(
        ["--out", out, "--n", "1", "--model-dir", MODELS] + extra
    )
    return os.path.join(out, "scene_0000")


def _check_scene(sd, dataset, names):
    sc = scene_mod.load_scene(sd, dataset=dataset)
    # Depth decodes through the dataset codec into the synthetic workspace
    # band (objects at ~0.6-0.8 m camera depth, table at 0.8).
    d = np.asarray(sc.depth)
    assert 0.5 < d[d > 0].min() < d.max() <= 0.81
    assert set(sc.object_names) == set(names)
    assert sc.gt_poses and set(sc.gt_poses) == set(names)
    # GT world poses sit above the table surface plane.
    table_z = float(np.asarray(sc.table_pose)[2, 3])
    for n in names:
        z = float(np.asarray(sc.gt_poses[n])[2, 3])
        assert z > table_z - 0.01, f"{n} below the table plane"
    return sc


def test_apc_layout_roundtrip(tmp_path):
    sd = _generate(tmp_path, ["--objects", APC_OBJS, "--obj-config", OBJ_CFG])
    _check_scene(sd, "APC", APC_OBJS.split(","))


def test_ycb_layout_roundtrip(tmp_path):
    sd = _generate(
        tmp_path,
        ["--objects", YCB_OBJS, "--obj-config", OBJ_CFG_YCB,
         "--dataset", "YCB"],
    )
    _check_scene(sd, "YCB", YCB_OBJS.split(","))


def test_stacked_scene_is_geometrically_consistent(tmp_path):
    sd = _generate(
        tmp_path,
        ["--objects", APC_OBJS, "--obj-config", OBJ_CFG, "--stack"],
    )
    sc = _check_scene(sd, "APC", APC_OBJS.split(","))
    base, top = APC_OBJS.split(",")
    pb = np.asarray(sc.gt_poses[base])
    pt = np.asarray(sc.gt_poses[top])
    # The top object's center is above the base's center (world +z up) and
    # within its footprint (the generator jitters <= ~2 cm around the base).
    assert pt[2, 3] > pb[2, 3] + 0.02
    assert np.linalg.norm(pt[:2, 3] - pb[:2, 3]) < 0.05

def test_hard_family_roundtrip(tmp_path):
    """Hard family (occlusion + noise + dropout + distractor): the scene
    still loads through the real loader, every labeled object keeps a
    solvable visible footprint, and the corruption knobs actually applied."""
    import json

    sd = _generate(
        tmp_path,
        ["--objects", APC_OBJS, "--obj-config", OBJ_CFG, "--hard"],
    )
    sc = scene_mod.load_scene(sd, dataset="APC")
    assert set(sc.object_names) == set(APC_OBJS.split(","))
    with open(f"{sd}/hard_stats.json") as fh:
        stats = json.load(fh)
    assert stats["tilt_deg"] > 0 and stats["distractor"]
    assert set(stats["occlusion_frac"]) == set(APC_OBJS.split(","))
    # The camera is tilted: its world pose is not the straight-down one.
    cam = np.asarray(sc.cam_pose)
    assert abs(cam[2, 2] + 1.0) > 0.1  # z_cam no longer exactly -z_world
    # Dropout: a visible share of in-frustum pixels is zeroed (the easy
    # generator writes a full table plane - zero invalid pixels).
    d = np.asarray(sc.depth)
    assert (d == 0).mean() > 0.05
    # Solvable: every labeled object keeps >= 250 mask pixels.
    from PIL import Image

    mask = np.asarray(Image.open(f"{sd}/frame-000000.mask.png"))
    import yaml

    with open(OBJ_CFG) as fh:
        objcfg = yaml.safe_load(fh)["objects"]
    ids = {objcfg[f"object_{i}"]["name"]: int(objcfg[f"object_{i}"]["classId"])
           for i in range(1, int(objcfg["num_objects"]) + 1)}
    for n in APC_OBJS.split(","):
        assert (mask == ids[n]).sum() >= 250
