"""IoU comparison of the shipped FCN checkpoints (VERDICT r2 Next #6).

Evaluates every shipped checkpoint on the SAME held-out scene sets, both
distributions (plain synthetic + domain-randomized), at the two serving
scales - the apples-to-apples table ROUND3_NOTES.md records (the training
script's own holdout number mixes distributions across runs).

Run: python scripts/eval_fcn_checkpoints.py [--platform tpu]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
args = parser.parse_args()

import jax

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.models import assets, fcn, objectdb

OBJECTS = {
    "kleenex_tissue_box": 8,
    "expo_dry_erase_board_eraser": 2,
    "folgers_classic_roast_coffee": 3,
}


def main():
    from physimglobalpose_tpu.utils import synthdata

    db = objectdb.load_object_db(
        "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml",
        "/root/reference/src/physim_pose_estimation/models_visualization",
        cache_dir="/tmp/ppf_cache", only=list(OBJECTS),
    )
    meshes = {n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS}
    intr1 = np.array(
        [[307.0, 0.0, 160.0], [0.0, 307.0, 120.0], [0.0, 0.0, 1.0]], np.float32
    )

    # Held-out scenes (seed far from the training stream).
    scene_sets = {}
    for dist in (False, True):
        rng = np.random.default_rng(90210)
        scene_sets[dist] = [
            synthdata.render_scene(meshes, OBJECTS, rng, intr1, 240, 320,
                                   domain_random=dist)[:2]
            for _ in range(6)
        ]

    ckpts = []
    for variant in ("small", "full"):
        p = fcn.shipped_checkpoint_path(variant)
        if os.path.exists(p):
            ckpts.append((variant, p))
    extra_32s = os.path.join(
        os.path.dirname(fcn.shipped_checkpoint_path()), "fcn_synth_apc_vgg16_32s.npz"
    )
    if os.path.exists(extra_32s):
        ckpts.append(("vgg16_32s(unshipped)", extra_32s))

    print(f"{'checkpoint':24s} {'model':28s} {'plain mIoU':>11s} {'dom-rand mIoU':>14s}")
    for name, path in ckpts:
        params, meta = fcn.load_params_npz(path)
        model = fcn.build_model(meta["model"], num_classes=meta["num_classes"])

        @jax.jit
        def infer(p, img):
            return jnp.argmax(model.apply({"params": p}, img[None])[0], axis=-1)

        mious = {}
        for dist, scenes in scene_sets.items():
            ious = []
            for c_img, l_img in scenes:
                pred = np.asarray(
                    infer(params, jnp.asarray(c_img.astype(np.float32) / 255.0))
                )
                for cid in set(np.unique(l_img)) - {0}:
                    inter = ((pred == cid) & (l_img == cid)).sum()
                    union = ((pred == cid) | (l_img == cid)).sum()
                    if union:
                        ious.append(inter / union)
            mious[dist] = float(np.mean(ious)) if ious else 0.0
        print(f"{name:24s} {meta['model']:28s} {mious[False]:11.3f} {mious[True]:14.3f}")


if __name__ == "__main__":
    main()
