"""Whole-scene latency benchmark: the <1 s end-to-end north star.

VERDICT r2 Next #2: a timed whole-scene artifact for both verification
paths, recorded in the repo (WHOLE_SCENE_BENCH.json next to this script's
invocation cwd, i.e. the repo root).

Measures, on the reference's bundled 3-object APC test scene at the
production preset:
- serial LCP scene (api.estimate_pose, warm, best of N)      [seconds/scene]
- batched LCP sweep on this backend (8 scene copies)         [scenes/sec]
- whole-scene MCTS (api.estimate_pose verification=MCTS)     [seconds/scene]
- whole-scene LCP with NEURAL segmentation (FCNThreshold, the reference
  demo's configuration - README.md:30) for both shipped checkpoints, with
  the predictor's own inference time split out, plus the shipped nets'
  mIoU on the bundled REAL frame vs frame-000000.mask.png (VERDICT r3 #2)

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
parser.add_argument("--skip-fcn", action="store_true")
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

    def flush():
        # Partial results survive a late-section failure (the FCN rows run
        # last and exercise the axon compile path's size limits).
        out["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)

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
    flush()

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
        dt, resc = timed_best(lambda: scene_sweep.sweep_scenes(
            None, sweep_dirs, db, dataset="APC", cfg=CFG,
            pipeline_chunks=chunks,
        ))
        out[f"lcp_sweep_pipelined{chunks}_scenes_per_sec"] = round(n / dt, 3)
        tmg = resc[sweep_dirs[0]].timings
        out[f"lcp_sweep_pipelined{chunks}_preprocess_host_s"] = round(
            tmg.get("preprocess_host_s", 0.0), 3
        )
    out["pipelined_note"] = (
        "Overlap is complete once the next chunk's HOST preprocessing (the "
        "measured preprocess_host_s per scene, reported per row) hides "
        "behind the current chunk's device program - 2 chunks already "
        "achieve that on this scene batch. More chunks past that point only "
        "SHRINK the per-dispatch job batch (an 8-scene sweep at 4 chunks "
        "runs 2-scene = 6-job device programs), losing device-side batch "
        "amortization with nothing left to hide; that is why "
        "pipelined4 <= pipelined2. Tune pipeline_chunks to the smallest "
        "value whose preprocess_host_s is below device_s."
    )
    flush()

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
        flush()

    # --- whole-scene LCP with NEURAL segmentation (the reference demo's
    # configuration: rosservice call ... "FCNThreshold" "PCS" "LCP",
    # README.md:30). Both shipped checkpoints, predictor time split out.
    if not args.skip_fcn:
        from physimglobalpose_tpu.models import fcn as fcn_mod

        # (row label, checkpoint variant, tta_scales). prior_tta = the
        # production --fcn-tta path: multi-scale prob averaging fused into
        # ONE device program (fcn.make_predictor tta_scales), so its latency
        # delta vs the plain prior row IS the TTA cost.
        timed_variants = [("small", "small", (1.0,))]
        if os.path.exists(fcn_mod.shipped_checkpoint_path("prior")):
            timed_variants.append(("prior", "prior", (1.0,)))
            timed_variants.append(("prior_tta", "prior", (0.5, 0.75, 1.0)))
        # ("full", "full", (1.0,)) retired r5: 134 M params at real-frame
        # mIoU 0.024 (VERDICT r4 #9) - checkpoint no longer shipped.
        for variant_label, variant, tta_scales in timed_variants:
            pred = fcn_mod.load_shipped_predictor(
                variant=variant, tta_scales=tta_scales)
            pred_calls = []

            def timed_pred(color, wanted, _p=pred, _c=pred_calls):
                t0 = time.perf_counter()
                r = _p(color, wanted)
                _c.append(time.perf_counter() - t0)
                return r

            def run_fcn(seed):
                return api.estimate_pose(
                    SCENE, db, dataset="APC",
                    segmentation_mode="FCNThreshold",
                    hypothesis_mode="PCS", verification_mode="LCP",
                    cfg=CFG, seed=seed, write_result=False,
                    nn_predictor=timed_pred,
                )

            try:
                res = run_fcn(0)  # compile warm-up (predictor jit included)
                ft = []
                for _ in range(args.repeat):
                    pred_calls.clear()
                    t0 = time.perf_counter()
                    res = run_fcn(0)
                    ft.append((time.perf_counter() - t0, sum(pred_calls)))
                best = min(ft)
                out[f"fcn_{variant_label}_lcp_seconds_per_scene_warm"] = round(best[0], 3)
                out[f"fcn_{variant_label}_predictor_seconds_per_scene"] = round(best[1], 3)
                # Pose agreement vs the golden GT-segmentation poses
                # (tests/golden/, reference-oracle corroborated by
                # REF_PARITY.json): does the NEURAL segmentation stage
                # reproduce the GT-mask pipeline's answer on the real frame?
                golden_path = os.path.join(
                    os.path.dirname(__file__), "..", "tests", "golden",
                    "bundled_scene_world_poses.json")
                with open(golden_path) as fh:
                    golden = {k: np.asarray(v, np.float32)
                              for k, v in json.load(fh).items()}
                import jax.numpy as jnp

                from physimglobalpose_tpu.geometry import metrics
                agree = {}
                for obj in res.objects:
                    if obj.name not in golden:
                        continue
                    rot, tr = metrics.pose_error(
                        jnp.asarray(obj.pose_world),
                        jnp.asarray(golden[obj.name]),
                        jnp.asarray(db[obj.name].symmetry))
                    agree[obj.name] = {
                        "rot_deg": round(float(rot), 2),
                        "trans_m": round(float(tr), 4),
                    }
                out[f"fcn_{variant_label}_vs_golden_pose"] = agree
            except Exception as e:  # record, keep the other rows
                out[f"fcn_{variant_label}_error"] = f"{type(e).__name__}: {e}"[:300]
            flush()

        # --- everything-on configuration: NEURAL segmentation + MCTS ---
        # The reference demo pairs FCNThreshold with LCP (README.md:30); the
        # paper's headline method is the physics-aware MCTS. This row times
        # both stages together - the full pipeline with no GT inputs at all.
        if not args.skip_mcts:
            for variant in ("small", "prior"):
                if not os.path.exists(fcn_mod.shipped_checkpoint_path(variant)):
                    continue
                pred = fcn_mod.load_shipped_predictor(variant=variant)
                pred_calls = []

                def timed_pred(color, wanted, _p=pred, _c=pred_calls):
                    t0 = time.perf_counter()
                    r = _p(color, wanted)
                    _c.append(time.perf_counter() - t0)
                    return r

                def run_fcn_mcts(seed):
                    return api.estimate_pose(
                        SCENE, db, dataset="APC",
                        segmentation_mode="FCNThreshold",
                        hypothesis_mode="PCS", verification_mode="MCTS",
                        cfg=CFG, seed=seed, write_result=False,
                        nn_predictor=timed_pred,
                    )

                try:
                    run_fcn_mcts(0)  # warm-up
                    ft = []
                    for _ in range(args.repeat):
                        pred_calls.clear()
                        t0 = time.perf_counter()
                        run_fcn_mcts(0)
                        ft.append((time.perf_counter() - t0, sum(pred_calls)))
                    best = min(ft)
                    out[f"fcn_{variant}_mcts_seconds_per_scene_warm"] = round(best[0], 3)
                    out[f"fcn_{variant}_mcts_predictor_seconds_per_scene"] = round(best[1], 3)
                except Exception as e:
                    out[f"fcn_{variant}_mcts_error"] = f"{type(e).__name__}: {e}"[:300]
                flush()

        # mIoU of the shipped nets on the one REAL labeled frame in the
        # environment (frame-000000.mask.png) - the honest real-imagery
        # number for synthetic-only training data.
        from PIL import Image

        import jax.numpy as jnp

        color = np.asarray(Image.open(os.path.join(SCENE, "frame-000000.color.png")))
        gt_mask = np.asarray(Image.open(os.path.join(SCENE, "frame-000000.mask.png")))
        scene_classes = sorted(int(c) for c in np.unique(gt_mask) if c != 0)
        real = {"classes": scene_classes}
        shipped = {
            v: os.path.exists(fcn_mod.shipped_checkpoint_path(v))
            for v in ("small", "full", "transfer", "prior")
        }
        miou_rows = [("small", "small", (1.0,))]
        if shipped["full"]:
            miou_rows.append(("full", "full", (1.0,)))
        for extra in ("transfer", "prior"):
            if shipped[extra]:
                miou_rows.append((extra, extra, (1.0,)))
        if shipped["prior"]:
            # The production --fcn-tta configuration (fcn.make_predictor
            # tta_scales; probe grid in scripts/r4_fcn_tta_probe.py).
            miou_rows.append(("prior_tta", "prior", (0.5, 0.75, 1.0)))
        hh, ww = color.shape[:2]
        for row_label, variant, tta_scales in miou_rows:
            params, meta = fcn_mod.load_params_npz(
                fcn_mod.shipped_checkpoint_path(variant)
            )
            model = fcn_mod.build_model(meta["model"], meta["num_classes"])
            labeler = fcn_mod.make_labeler(model, hh, ww,
                                           tta_scales=tta_scales)
            label = labeler(jax.device_put(params), color)
            ious = {}
            for c in scene_classes:
                inter = float(((label == c) & (gt_mask == c)).sum())
                union = float(((label == c) | (gt_mask == c)).sum())
                ious[str(c)] = round(inter / union, 4) if union else 0.0
            real[row_label] = {
                "per_class_iou": ious,
                "miou": round(sum(ious.values()) / len(ious), 4),
            }
        real["note"] = (
            "Shipped checkpoints are trained ONLY on this framework's "
            "domain-randomized synthetic renders (no real APC imagery "
            "exists in this environment - the reference's apc_weights.hdf5 "
            "was trained on real captures, predict:59); this row is the "
            "measured synthetic-to-real transfer on the single real "
            "labeled frame available."
        )
        out["fcn_real_frame_miou"] = real

    out["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
