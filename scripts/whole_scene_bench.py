"""Whole-scene latency benchmark: the <1 s end-to-end north star.

VERDICT r2 Next #2: a timed whole-scene artifact for both verification
paths, recorded in the repo (WHOLE_SCENE_BENCH.json next to this script's
invocation cwd, i.e. the repo root).

Measures, on the reference's bundled 3-object APC test scene at the
production preset:
- serial LCP scene (api.estimate_pose, warm, best of N)      [seconds/scene]
- batched LCP sweep on this backend (8 scene copies)         [scenes/sec]
- whole-scene MCTS (api.estimate_pose verification=MCTS)     [seconds/scene]

Reference envelope to compare: full estimatePose per scene
(main.cpp:86-171), 2 s/object Super4PCS budget (super4pcs_test.cc:20-37)
plus a 60 s MCTS budget (UCTSearch.cpp:10) - i.e. minutes per scene.

Run: python scripts/whole_scene_bench.py            (TPU, the default)
     python scripts/whole_scene_bench.py --platform cpu
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
parser.add_argument("--repeat", type=int, default=3)
parser.add_argument("--sweep-scenes", type=int, default=8)
parser.add_argument("--out", default="WHOLE_SCENE_BENCH.json")
parser.add_argument("--skip-mcts", action="store_true")
args = parser.parse_args()

if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

import jax
import numpy as np

from physimglobalpose_tpu.config import PipelineConfig, PreprocessConfig, StoCSConfig
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.parallel import scene_sweep
from physimglobalpose_tpu.pipeline import api

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"

CFG = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
    max_model_points=512,
    max_validation_points=1024,
)


def main():
    backend = jax.default_backend()
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    out = {"backend": backend, "scene": SCENE, "objects": 3}

    # --- serial LCP scene, warm ---
    def run_lcp(seed):
        return api.estimate_pose(
            SCENE, db, dataset="APC", segmentation_mode="GT",
            hypothesis_mode="PCS", verification_mode="LCP",
            cfg=CFG, seed=seed, write_result=False,
        )

    run_lcp(0)  # compile warm-up
    times = []
    for i in range(args.repeat):
        t0 = time.perf_counter()
        run_lcp(0)
        times.append(time.perf_counter() - t0)
    out["lcp_seconds_per_scene_warm"] = round(min(times), 3)

    # --- batched sweep (same scene replicated; measures steady throughput
    # including host preprocessing, which runs per copy) ---
    n = args.sweep_scenes
    # Replicate the scene via symlinks (the sweep keys results by directory).
    sweep_dirs = []
    import tempfile
    tmp = tempfile.mkdtemp(prefix="sweepscene")
    for i in range(n):
        d = os.path.join(tmp, f"s{i}")
        os.symlink(SCENE, d)
        sweep_dirs.append(d)
    # Warm with the SAME job count (the sweep's device program shape depends
    # on the number of jobs; warming with 1 scene would leave the n-job
    # program compiling inside the timed region).
    # All sweep rows are best-of-repeat like the serial rows: single samples
    # on this steal-heavy host vary ~2x and are not a regression signal.
    def timed_best(fn):
        best_dt, best_res = float("inf"), None
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            res = fn()
            dt = time.perf_counter() - t0
            if dt < best_dt:
                best_dt, best_res = dt, res
        return best_dt, best_res

    scene_sweep.sweep_scenes(None, sweep_dirs, db, dataset="APC", cfg=CFG)
    dt, resn = timed_best(lambda: scene_sweep.sweep_scenes(
        None, sweep_dirs, db, dataset="APC", cfg=CFG))
    out["lcp_sweep_scenes_per_sec"] = round(n / dt, 3)
    out["lcp_sweep_batch"] = n
    first = resn[sweep_dirs[0]]
    out["lcp_sweep_timings"] = {k: round(v, 3) for k, v in first.timings.items()}

    # Pipelined sweep: chunk i+1's host preprocessing + uploads overlap
    # chunk i's device program (transfers and kernels run concurrently on
    # the axon backend - scripts/r3_sweep_overlap_probe.py).
    for chunks in (2, 4):
        scene_sweep.sweep_scenes(
            None, sweep_dirs, db, dataset="APC", cfg=CFG,
            pipeline_chunks=chunks,
        )  # warm the per-chunk program shape
        dt, _ = timed_best(lambda: scene_sweep.sweep_scenes(
            None, sweep_dirs, db, dataset="APC", cfg=CFG,
            pipeline_chunks=chunks,
        ))
        out[f"lcp_sweep_pipelined{chunks}_scenes_per_sec"] = round(n / dt, 3)

    # --- whole-scene MCTS ---
    if not args.skip_mcts:
        def run_mcts(seed):
            return api.estimate_pose(
                SCENE, db, dataset="APC", segmentation_mode="GT",
                hypothesis_mode="PCS", verification_mode="MCTS",
                cfg=CFG, seed=seed, write_result=False,
            )

        run_mcts(0)
        mt = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            run_mcts(0)
            mt.append(time.perf_counter() - t0)
        # best-of-N, like the LCP row: single samples on this steal-heavy
        # host vary ~2x and are not a regression signal.
        out["mcts_seconds_per_scene_warm"] = round(min(mt), 3)

        # Multi-scene MCTS sweep: all scenes' searches share leaf dispatches
        # (MultiSceneLeafEvaluator) - the per-scene cost of the search
        # amortizes across the batch.
        scene_sweep.sweep_scenes(
            None, sweep_dirs, db, dataset="APC", cfg=CFG,
            verification_mode="MCTS",
        )
        dt, _ = timed_best(lambda: scene_sweep.sweep_scenes(
            None, sweep_dirs, db, dataset="APC", cfg=CFG,
            verification_mode="MCTS",
        ))
        out["mcts_sweep_scenes_per_sec"] = round(n / dt, 3)
        out["mcts_sweep_seconds_per_scene"] = round(dt / n, 3)

    out["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
