"""Round-5 eval families -> SYNTH_EVAL.json sections (VERDICT r4 #4, #7).

Families:
  hard_ycb   occlusion/contact/noise hard scenes with YCB objects
             (obj_config_ycb.yml class ids, plain-mm depth codec) - the
             hard-family thesis carried across datasets.
  hard_six   6-object APC hard scenes - occlusion AND assignment-space
             pressure together.
  rcnn       RCNN segmentation mode end to end with the TRAINED detection
             network (models/detect.py): detection quality (top-1 box IoU
             vs GT-mask boxes per instance) + downstream pose ADD-S.

Run (TPU default): python scripts/r5_eval.py --family rcnn [--scenes 8]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG_APC = (
    "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"
)
OBJ_CFG_YCB = (
    "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config_ycb.yml"
)

FAMILIES = {
    "hard_ycb": dict(
        objects="003_cracker_box,005_tomato_soup_can,006_mustard_bottle",
        dataset="YCB", obj_config=OBJ_CFG_YCB, hard=True,
        modes="LCP,MCTS", segmentation="GT",
    ),
    "hard_six": dict(
        objects=("kleenex_tissue_box,expo_dry_erase_board_eraser,"
                 "folgers_classic_roast_coffee,crayola_24_ct,"
                 "dove_beauty_bar,elmers_washable_no_run_school_glue"),
        dataset="APC", obj_config=OBJ_CFG_APC, hard=True,
        modes="LCP,MCTS", segmentation="GT",
    ),
    "rcnn": dict(
        objects=("kleenex_tissue_box,expo_dry_erase_board_eraser,"
                 "folgers_classic_roast_coffee"),
        dataset="APC", obj_config=OBJ_CFG_APC, hard=False,
        modes="LCP", segmentation="RCNN",
    ),
}


def _detection_quality(scene_dirs, db, class_ids):
    """Top-1 box IoU of the learned detector vs GT-mask boxes, per instance."""
    import numpy as np
    from PIL import Image

    from physimglobalpose_tpu.pipeline.detector import make_learned_detector

    det = make_learned_detector()
    ious, hits, misses = [], 0, 0
    for sd in scene_dirs:
        color = np.asarray(Image.open(os.path.join(sd, "frame-000000.color.png")))[..., :3]
        mask = np.asarray(Image.open(os.path.join(sd, "frame-000000.mask.png")))
        boxes = det(color, class_ids)
        for cid in class_ids:
            ys, xs = np.nonzero(mask == cid)
            if len(ys) < 8:
                continue
            gt = (xs.min(), ys.min(), xs.max(), ys.max())
            if cid not in boxes:
                misses += 1
                ious.append(0.0)
                continue
            b = boxes[cid]
            ix1, iy1 = max(gt[0], b[0]), max(gt[1], b[1])
            ix2, iy2 = min(gt[2], b[2]), min(gt[3], b[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            union = ((gt[2] - gt[0]) * (gt[3] - gt[1])
                     + max(b[2] - b[0], 0) * max(b[3] - b[1], 0) - inter)
            iou = inter / max(union, 1e-6)
            ious.append(float(iou))
            hits += iou >= 0.5
    return {
        "instances": len(ious),
        "mean_box_iou": round(float(np.mean(ious)), 3) if ious else 0.0,
        "recall_at_0.5": round(hits / max(len(ious), 1), 3),
        "missed": misses,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modes", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "SYNTH_EVAL.json"))
    args = ap.parse_args(argv)
    fam = FAMILIES[args.family]
    scene_dir = args.dir or f"/tmp/r5_{args.family}_scenes"
    modes = (args.modes or fam["modes"]).split(",")

    # Scene generation in a CPU-pinned subprocess (jax platform is fixed at
    # first backend touch; this process may want the TPU for the eval).
    if not os.path.isdir(os.path.join(scene_dir, f"scene_{args.scenes-1:04d}")):
        gen = [sys.executable,
               os.path.join(REPO, "scripts/make_synthetic_scenes.py"),
               "--out", scene_dir, "--n", str(args.scenes),
               "--objects", fam["objects"], "--seed", str(args.seed),
               "--dataset", fam["dataset"], "--obj-config", fam["obj_config"]]
        if fam["hard"]:
            gen.append("--hard")
        subprocess.run(gen, check=True)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import numpy as np

    from physimglobalpose_tpu.config import (
        PipelineConfig, PreprocessConfig, StoCSConfig,
    )
    from physimglobalpose_tpu.models import objectdb
    from physimglobalpose_tpu.pipeline import evaluate

    cfg = PipelineConfig(
        preprocess=PreprocessConfig(max_segment_points=512),
        stocs=StoCSConfig(num_bases=48, max_quads_per_base=32,
                          max_pairs_per_ppf=128),
        max_model_points=512,
        max_validation_points=1024,
    )
    objects = fam["objects"].split(",")
    db = objectdb.load_object_db(
        fam["obj_config"], MODELS, config=cfg,
        cache_dir=f"/tmp/ppf_cache_{fam['dataset'].lower()}", only=objects,
    )
    scene_dirs = [
        os.path.join(scene_dir, f"scene_{i:04d}") for i in range(args.scenes)
    ]

    section = {
        "generator": (
            f"make_synthetic_scenes.py {'--hard ' if fam['hard'] else ''}"
            f"--n {args.scenes} --dataset {fam['dataset']} "
            f"--objects {fam['objects']} (seed {args.seed})"
        ),
        "scenes": args.scenes,
        "instances": args.scenes * len(objects),
        "segmentation": fam["segmentation"],
        "backend": jax.default_backend(),
    }
    if fam["hard"]:
        occ = []
        for sd in scene_dirs:
            with open(os.path.join(sd, "hard_stats.json")) as fh:
                occ.extend(json.load(fh)["occlusion_frac"].values())
        section["occlusion_frac"] = {
            "mean": round(float(np.mean(occ)), 3),
            "max": round(float(np.max(occ)), 3),
            "over_50pct": int(sum(o > 0.5 for o in occ)),
        }
    if fam["segmentation"] == "RCNN":
        class_ids = [db.class_of(n) for n in objects]
        section["detection"] = _detection_quality(scene_dirs, db, class_ids)
        print("detection:", json.dumps(section["detection"]), flush=True)

    for mode in modes:
        log = f"/tmp/r5_eval_{args.family}_{mode}_{args.seed}.jsonl"
        if os.path.exists(log):
            os.remove(log)
        t0 = time.time()
        agg = evaluate.evaluate_scenes(
            scene_dirs, db, log, dataset=fam["dataset"],
            segmentation_mode=fam["segmentation"],
            verification_mode=mode, cfg=cfg, seed=args.seed,
        )
        per_obj, worst = {}, []
        with open(log) as fh:
            for line in fh:
                row = json.loads(line)
                for name, entry in row["objects"].items():
                    if "adds_m" in entry:
                        per_obj.setdefault(name, []).append(entry["adds_m"])
                        worst.append((entry["adds_m"], row["scene"], name))
        section[mode] = {
            "adds_within_2cm": agg.get("adds_within_2cm"),
            "mean_adds_m": round(agg.get("mean_adds_m", 0.0), 5),
            "max_adds_m": round(max(max(v) for v in per_obj.values()), 4),
            "per_object_mean_adds_m": {
                k: round(float(np.mean(v)), 5) for k, v in per_obj.items()
            },
            "wall_s": round(time.time() - t0, 1),
        }
        worst.sort(reverse=True)
        section[mode]["worst3"] = [
            {"adds_m": round(a, 4), "scene": os.path.basename(s), "obj": n}
            for a, s, n in worst[:3]
        ]
        print(mode, json.dumps(section[mode]), flush=True)

    section["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(args.out) as fh:
        synth = json.load(fh)
    merged = synth.get(args.family, {})
    merged.update(section)
    synth[args.family] = merged
    with open(args.out, "w") as fh:
        json.dump(synth, fh, indent=1)
    print(f"merged '{args.family}' section into {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
