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