"""Hard-family accuracy eval -> SYNTH_EVAL.json "hard" section (VERDICT r3 #4).

Generates the hard synthetic scenes (tilted-camera occlusion 0.4-0.9,
touching footprints, 15% depth dropout + 3 mm noise, unlabeled duplicate-
geometry distractor - scripts/make_synthetic_scenes.py --hard), then runs
the full pipeline at the small production preset with LCP, MCTS and GREEDY
verification, and merges a "hard" section into SYNTH_EVAL.json with the
per-method ADD-S results and the occlusion distribution. The section exists
to DISCRIMINATE: the easy families saturate at ~100% for every method
(VERDICT r3 Weak #1); here best-LCP must measurably degrade and the
physics-aware searches' margin is quantified.

Run (TPU default): python scripts/r4_hard_eval.py [--scenes 8] [--platform cpu]
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
OBJ_CFG = (
    "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"
)
OBJECTS = ("kleenex_tissue_box,expo_dry_erase_board_eraser,"
           "folgers_classic_roast_coffee")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/hard_scenes_r4")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modes", default="LCP,MCTS,GREEDY")
    ap.add_argument("--out", default=os.path.join(REPO, "SYNTH_EVAL.json"))
    args = ap.parse_args(argv)

    # Scene generation runs in a SUBPROCESS pinned to CPU so this process's
    # jax backend choice stays free for the eval (jax is preloaded by
    # sitecustomize; platform is fixed at first backend touch).
    if not os.path.isdir(os.path.join(args.dir, f"scene_{args.scenes-1:04d}")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/make_synthetic_scenes.py"),
             "--out", args.dir, "--n", str(args.scenes), "--hard",
             "--objects", OBJECTS, "--seed", str(args.seed)],
            check=True,
        )

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
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=cfg, cache_dir="/tmp/ppf_cache",
        only=OBJECTS.split(","),
    )
    scene_dirs = [
        os.path.join(args.dir, f"scene_{i:04d}") for i in range(args.scenes)
    ]

    occ = []
    for sd in scene_dirs:
        with open(os.path.join(sd, "hard_stats.json")) as fh:
            occ.extend(json.load(fh)["occlusion_frac"].values())

    section = {
        "generator": (f"make_synthetic_scenes.py --hard --n {args.scenes} "
                      f"--objects {OBJECTS} (seed {args.seed})"),
        "scenes": args.scenes,
        "instances": args.scenes * 3,
        "occlusion_frac": {
            "mean": round(float(np.mean(occ)), 3),
            "max": round(float(np.max(occ)), 3),
            "over_50pct": int(sum(o > 0.5 for o in occ)),
        },
        "corruption": "tilt 55 deg, dropout 0.15, noise 3 mm, distractor on",
        "backend": jax.default_backend(),
    }

    for mode in args.modes.split(","):
        log = f"/tmp/hard_eval_{mode}_{args.seed}.jsonl"
        if os.path.exists(log):
            os.remove(log)
        t0 = time.time()
        agg = evaluate.evaluate_scenes(
            scene_dirs, db, log, dataset="APC", segmentation_mode="GT",
            verification_mode=mode, cfg=cfg, seed=args.seed,
        )
        # Per-object breakdown from the log.
        per_obj = {}
        worst = []
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
    # Merge per-mode so partial re-runs (--modes) keep earlier results.
    merged = synth.get("hard", {})
    merged.update(section)
    synth["hard"] = merged
    with open(args.out, "w") as fh:
        json.dump(synth, fh, indent=1)
    print(f"merged 'hard' section into {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
