"""A/B cfg.mcts.prefix_cache on TPU: serial warm MCTS + 8-scene MCTS sweep.

prefix_cache reuses ancestors' settled poses so leaf evals settle only
their tail (the reference's UCTState carries settled state down the tree).
The win is bounded by the rollout-tail settles (always required) and the
fallback rate (descents into not-yet-backed-up subtrees re-scan from
scratch); this probe is the measured basis for the shipped default.
"""
import sys, os, time, dataclasses, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from physimglobalpose_tpu.config import (
    PipelineConfig, PreprocessConfig, StoCSConfig,
)
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.parallel import scene_sweep
from physimglobalpose_tpu.pipeline import api
import physimglobalpose_tpu.pipeline.mcts as M

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"

BASE = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
    max_model_points=512,
    max_validation_points=1024,
)
REPEAT = 4


def main():
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=BASE, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    tmp = tempfile.mkdtemp(prefix="sweepscene")
    dirs = []
    for i in range(8):
        d = os.path.join(tmp, f"s{i}")
        os.symlink(SCENE, d)
        dirs.append(d)

    def make(pc):
        cfg = dataclasses.replace(
            BASE, mcts=dataclasses.replace(BASE.mcts, prefix_cache=pc)
        )
        serial = lambda: api.estimate_pose(
            SCENE, db, dataset="APC", segmentation_mode="GT",
            hypothesis_mode="PCS", verification_mode="MCTS",
            cfg=cfg, seed=0, write_result=False,
        )
        sweep = lambda: scene_sweep.sweep_scenes(
            None, dirs, db, dataset="APC", cfg=cfg, verification_mode="MCTS",
        )
        return serial, sweep

    arms = {pc: make(pc) for pc in (False, True)}
    best = {pc: [float("inf"), float("inf")] for pc in arms}
    for serial, sweep in arms.values():  # warm both arms' programs
        serial(); sweep()
    # INTERLEAVED reps: host steal drifts on ~minutes timescales, so
    # back-to-back blocks flip the A/B sign run to run; alternating arms
    # within each rep compares under the same conditions.
    for _ in range(REPEAT):
        for pc, (serial, sweep) in arms.items():
            t0 = time.perf_counter(); serial()
            best[pc][0] = min(best[pc][0], time.perf_counter() - t0)
            t0 = time.perf_counter(); sweep()
            best[pc][1] = min(best[pc][1], time.perf_counter() - t0)
    for pc in arms:
        print(f"prefix_cache={pc}: serial {best[pc][0]*1e3:6.1f} ms/scene, "
              f"sweep {best[pc][1]/8*1e3:6.1f} ms/scene", flush=True)


if __name__ == "__main__":
    main()
