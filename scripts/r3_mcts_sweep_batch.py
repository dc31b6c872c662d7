"""MCTS sweep leaf_batch sizing: rounds vs per-round device time.

The multi-scene search (uct_search_multi) splits cfg.mcts.leaf_batch across
the live trees, so at the default 128 an 8-scene sweep gets only 16 leaves
per tree per round and pays ~75 rounds of dispatch+fetch. Larger batches
amortize the round cost; per-tree virtual-loss decorrelation at
batch//scenes <= 128 stays within what the single-scene search already uses
per round. Measures scenes/s and the per-scene best costs at each size
(costs must agree within noise - same search semantics, different round
granularity).
"""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from physimglobalpose_tpu.config import (
    PipelineConfig, PreprocessConfig, StoCSConfig,
)
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.parallel import scene_sweep

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"

BASE = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
    max_model_points=512,
    max_validation_points=1024,
)

N = 8
REPEAT = 3


def main():
    import tempfile

    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=BASE, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    tmp = tempfile.mkdtemp(prefix="sweepscene")
    dirs = []
    for i in range(N):
        d = os.path.join(tmp, f"s{i}")
        os.symlink(SCENE, d)
        dirs.append(d)

    for batch in (128, 256, 512, 1024):
        cfg = dataclasses.replace(
            BASE, mcts=dataclasses.replace(BASE.mcts, leaf_batch=batch)
        )
        run = lambda: scene_sweep.sweep_scenes(
            None, dirs, db, dataset="APC", cfg=cfg, verification_mode="MCTS",
        )
        res = run()  # warm/compile
        best = float("inf")
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            res = run()
            best = min(best, time.perf_counter() - t0)
        first = res[dirs[0]]
        scores = [round(float(e.score), 4) for e in first.objects]
        print(f"leaf_batch={batch:5d}: {N/best:6.3f} scenes/s "
              f"({best/N*1e3:7.1f} ms/scene) scene0 scores={scores}",
              flush=True)


if __name__ == "__main__":
    main()
