"""A/B the search pipelining depth (cfg.mcts.inflight_batches) on TPU.

Single-scene warm MCTS and the 8-scene MCTS sweep at depth 1 (classic
double-buffering) vs 2/3. Outcome (v5e, recorded in ROUND3_NOTES): the
per-round wall cost is device compute, not tunnel latency, so deeper
in-flight queues change nothing measurable; the knob ships defaulting to 2
(never slower, helps when host steal stretches the backup+collect gap).
"""
import sys, os, time, dataclasses, tempfile
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from physimglobalpose_tpu.config import (
    PipelineConfig, PreprocessConfig, StoCSConfig,
)
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.parallel import scene_sweep
from physimglobalpose_tpu.pipeline import api

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"

BASE = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
    max_model_points=512,
    max_validation_points=1024,
)
REPEAT = 3


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

    for depth in (1, 2, 3):
        cfg = dataclasses.replace(
            BASE, mcts=dataclasses.replace(BASE.mcts, inflight_batches=depth)
        )
        serial = lambda: api.estimate_pose(
            SCENE, db, dataset="APC", segmentation_mode="GT",
            hypothesis_mode="PCS", verification_mode="MCTS",
            cfg=cfg, seed=0, write_result=False,
        )
        sweep = lambda: scene_sweep.sweep_scenes(
            None, dirs, db, dataset="APC", cfg=cfg, verification_mode="MCTS",
        )
        serial(); sweep()  # warm
        b1 = b2 = float("inf")
        for _ in range(REPEAT):
            t0 = time.perf_counter(); serial(); b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter(); sweep(); b2 = min(b2, time.perf_counter() - t0)
        print(f"depth={depth}: serial {b1*1e3:6.1f} ms/scene, "
              f"sweep {b2/8*1e3:6.1f} ms/scene", flush=True)


if __name__ == "__main__":
    main()
