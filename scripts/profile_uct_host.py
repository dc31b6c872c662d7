"""Split the whole-scene MCTS search wall time: host tree policy vs device.

Monkeypatches timing probes around _collect_batch (host tree policy +
rollouts) and evaluate_async (dispatch) inside a real estimate_pose MCTS run
on the bundled scene, and reports the split against the recorded search_s.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from physimglobalpose_tpu.config import PipelineConfig, PreprocessConfig, StoCSConfig
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.pipeline import api
import physimglobalpose_tpu.pipeline.mcts as M

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"

CFG = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
    max_model_points=512,
    max_validation_points=1024,
)

stats = {"collect_s": 0.0, "dispatch_s": 0.0, "fetch_s": 0.0,
         "rounds": 0, "leaves": 0}

_collect = M._collect_batch
_backup = M._backup


def timed_collect(tree, alpha, quota):
    t0 = time.perf_counter()
    out = _collect(tree, alpha, quota)
    stats["collect_s"] += time.perf_counter() - t0
    stats["rounds"] += 1
    stats["leaves"] += len(out)
    return out


def timed_backup(tree, pend, costs):
    # np.asarray(costs) happens before _backup in the loop; costs is already
    # host-side here - time only the tree walk.
    t0 = time.perf_counter()
    _backup(tree, pend, costs)
    stats["collect_s"] += time.perf_counter() - t0
    return None


M._collect_batch = timed_collect
M._backup = timed_backup

_eval_async = M.BatchedLeafEvaluator.evaluate_async


def timed_eval_async(self, c, a):
    t0 = time.perf_counter()
    out = _eval_async(self, c, a)
    stats["dispatch_s"] += time.perf_counter() - t0
    return out


M.BatchedLeafEvaluator.evaluate_async = timed_eval_async


def main():
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    # warm
    api.estimate_pose(SCENE, db, dataset="APC", segmentation_mode="GT",
                      hypothesis_mode="PCS", verification_mode="MCTS",
                      cfg=CFG, seed=0, write_result=False)
    for k in stats:
        stats[k] = 0
    r = api.estimate_pose(SCENE, db, dataset="APC", segmentation_mode="GT",
                          hypothesis_mode="PCS", verification_mode="MCTS",
                          cfg=CFG, seed=0, write_result=False)
    t = r.timings
    other = t["search_s"] - stats["collect_s"] - stats["dispatch_s"]
    print(f"search_s total       : {t['search_s']:.2f} s")
    print(f"  host tree (collect+backup): {stats['collect_s']:.2f} s")
    print(f"  dispatch calls             : {stats['dispatch_s']:.2f} s "
          f"({stats['rounds']} rounds, {stats['leaves']} leaves)")
    print(f"  rest (fetch waits, evaluator build, final settle): {other:.2f} s")
    print(f"hypothesis_s         : {t['hypothesis_s']:.2f} s")
    print(f"total_s              : {t['total_s']:.2f} s")


if __name__ == "__main__":
    main()
