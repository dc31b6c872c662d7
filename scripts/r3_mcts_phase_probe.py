"""Phase split of the whole-scene MCTS stage at the production small preset.

Finer than profile_uct_host.py: separately times evaluator construction
(upload-bound), the UCT round loop (host tree policy vs dispatch vs the
blocking cost fetch), the final full-hull settle, and everything else in
search_s. Drives the remaining <1 s headroom work (ROUND3_NOTES
continuation 5: leaf dispatch is down to ~26 ms at steps=30 but warm
search_s is still ~0.6 s).
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from physimglobalpose_tpu.config import (
    PipelineConfig, PreprocessConfig, StoCSConfig,
)
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.pipeline import api
import physimglobalpose_tpu.pipeline.mcts as M

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"

# The CLI's --preset small (cli.py:67-73), the whole_scene_bench config.
CFG = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
    max_model_points=512,
    max_validation_points=1024,
)

stats = {
    "build_s": 0.0, "collect_s": 0.0, "dispatch_s": 0.0, "fetch_s": 0.0,
    "final_s": 0.0, "rounds": 0, "leaves": 0,
}

_init = M.BatchedLeafEvaluator.__init__
_collect = M._collect_batch
_backup = M._backup
_eval_async = M.BatchedLeafEvaluator.evaluate_async
_eval_final = M.BatchedLeafEvaluator.evaluate_final
_np_asarray = np.asarray


def timed_init(self, *a, **kw):
    t0 = time.perf_counter()
    _init(self, *a, **kw)
    stats["build_s"] += time.perf_counter() - t0


def timed_collect(tree, alpha, quota):
    t0 = time.perf_counter()
    out = _collect(tree, alpha, quota)
    stats["collect_s"] += time.perf_counter() - t0
    stats["rounds"] += 1
    stats["leaves"] += len(out)
    return out


def timed_backup(tree, pend, costs):
    t0 = time.perf_counter()
    _backup(tree, pend, costs)
    stats["collect_s"] += time.perf_counter() - t0


def timed_eval_async(self, c, a):
    t0 = time.perf_counter()
    out = _eval_async(self, c, a)
    stats["dispatch_s"] += time.perf_counter() - t0
    return out


def timed_eval_final(self, c, a):
    t0 = time.perf_counter()
    out = _eval_final(self, c, a)
    stats["final_s"] += time.perf_counter() - t0
    return out


# The blocking fetch in uct_search is np.asarray(prev_costs) - patch the
# module's np binding so only that call path is timed.
class _TimedNP:
    def __getattr__(self, name):
        return getattr(np, name)

    @staticmethod
    def asarray(x, *a, **kw):
        t0 = time.perf_counter()
        out = _np_asarray(x, *a, **kw)
        stats["fetch_s"] += time.perf_counter() - t0
        return out


def main():
    M.BatchedLeafEvaluator.__init__ = timed_init
    M._collect_batch = timed_collect
    M._backup = timed_backup
    M.BatchedLeafEvaluator.evaluate_async = timed_eval_async
    M.BatchedLeafEvaluator.evaluate_final = timed_eval_final
    M.np = _TimedNP()

    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    api.estimate_pose(SCENE, db, dataset="APC", segmentation_mode="GT",
                      hypothesis_mode="PCS", verification_mode="MCTS",
                      cfg=CFG, seed=0, write_result=False)  # warm
    best = None
    for rep in range(3):
        for k in stats:
            stats[k] = 0
        t0 = time.perf_counter()
        r = api.estimate_pose(SCENE, db, dataset="APC", segmentation_mode="GT",
                              hypothesis_mode="PCS", verification_mode="MCTS",
                              cfg=CFG, seed=0, write_result=False)
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, dict(stats), dict(r.timings))
    wall, st, t = best
    other = (t["search_s"] - st["build_s"] - st["collect_s"]
             - st["dispatch_s"] - st["fetch_s"] - st["final_s"])
    print(f"wall (best of 3)     : {wall:.3f} s")
    print(f"total_s              : {t['total_s']:.3f} s")
    print(f"  preprocess_s       : {t['preprocess_s']:.3f} s")
    print(f"  hypothesis_s       : {t['hypothesis_s']:.3f} s")
    print(f"  search_s           : {t['search_s']:.3f} s")
    print(f"    evaluator build  : {st['build_s']:.3f} s")
    print(f"    host tree policy : {st['collect_s']:.3f} s")
    print(f"    dispatch calls   : {st['dispatch_s']:.3f} s "
          f"({st['rounds']} rounds, {st['leaves']} leaves)")
    print(f"    cost fetch waits : {st['fetch_s']:.3f} s")
    print(f"    final settle     : {st['final_s']:.3f} s")
    print(f"    rest             : {other:.3f} s")
    print(f"  outside timings    : {wall - t['total_s']:.3f} s")


if __name__ == "__main__":
    main()
