"""Regenerate tests/golden/bundled_scene_world_poses.json + a sanity overlay.

Runs the exact configuration of tests/test_e2e_scene.py (SMALL_CFG, seed 0,
CPU backend) on the bundled reference scene, writes the world poses as the
golden pseudo-GT, and renders /tmp/golden_overlay.png for the required
one-time visual check (the projected model clouds must sit on the observed
objects).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.pipeline import api, scene as scene_mod
from physimglobalpose_tpu.utils import viz

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_e2e_scene import MODELS, OBJ_CFG, SCENE, SMALL_CFG  # noqa: E402


def main():
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=SMALL_CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    result = api.estimate_pose(
        SCENE, db, dataset="APC",
        segmentation_mode="GT", hypothesis_mode="PCS", verification_mode="LCP",
        cfg=SMALL_CFG, seed=0, write_result=False,
    )
    golden = {e.name: np.asarray(e.pose_world).tolist() for e in result.objects}
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        "bundled_scene_world_poses.json",
    )
    with open(out, "w") as fh:
        json.dump(golden, fh, indent=1)
    print("wrote", out)

    sc = scene_mod.load_scene(SCENE, dataset="APC")
    img = viz.overlay_poses(
        sc.color, sc.intrinsics,
        [db[e.name].validation_pts[:1024] for e in result.objects],
        [e.pose_cam for e in result.objects],
    )
    from PIL import Image

    Image.fromarray(img.astype(np.uint8)).save("/tmp/golden_overlay.png")
    print("eyeball /tmp/golden_overlay.png before committing")


if __name__ == "__main__":
    main()
