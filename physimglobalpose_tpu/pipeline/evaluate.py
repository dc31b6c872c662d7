"""Evaluation driver: dataset sweeps with metrics, JSONL logs, and resume.

The reference ships pose-error *functions* (symmetry-folded rot/trans,
utilities.cpp:514-577; EMD :425-484) but no evaluation driver (SURVEY.md
section 5). This module runs estimate_pose over many scene directories,
scores against gt_info.yml object poses when present (ADD, ADD-S, folded
rot/trans), appends one JSON line per scene, and skips scenes already in the
log on restart - the checkpoint/resume story for dataset sweeps.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.models.objectdb import ObjectDB
from physimglobalpose_tpu.pipeline import api, scene as scene_mod


def _metrics_for(
    est, gt_pose: np.ndarray, obj, emd_exact: bool = False
) -> Dict[str, float]:
    import jax.numpy as jnp

    from physimglobalpose_tpu.geometry import metrics

    test = jnp.asarray(est.pose_world.astype(np.float32))
    gt = jnp.asarray(gt_pose.astype(np.float32))
    model = jnp.asarray(obj.validation_pts[:1024])
    rot_err, trans_err = metrics.pose_error(test, gt, jnp.asarray(obj.symmetry))
    add = metrics.add_error(test, gt, model)
    adds = metrics.adds_error(test, gt, model)
    out = {
        "rot_err_deg": float(rot_err),
        "trans_err_m": float(trans_err),
        "add_m": float(add),
        "adds_m": float(adds),
    }
    if emd_exact:
        # Offline-only: exact transportation-LP EMD with the reference's
        # cv::EMD semantics (utilities.cpp:425-484); host-sequential, so not
        # part of the default per-scene metric set.
        pts = np.asarray(model)
        lo_hi_pad = 0.05
        lo = np.minimum(
            np.asarray(se3_apply(est.pose_world, pts)).min(0),
            np.asarray(se3_apply(gt_pose, pts)).min(0),
        ) - lo_hi_pad
        hi = np.maximum(
            np.asarray(se3_apply(est.pose_world, pts)).max(0),
            np.asarray(se3_apply(gt_pose, pts)).max(0),
        ) + lo_hi_pad
        out["emd_bins"] = metrics.emd_error_exact(test, gt, model, lo, hi)
    return out


def se3_apply(pose: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ pose[:3, :3].T + pose[:3, 3]


def completed_scenes(log_path: str) -> set:
    done = set()
    if os.path.exists(log_path):
        with open(log_path) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["scene"])
                except (json.JSONDecodeError, KeyError):
                    continue
    return done


def evaluate_scenes(
    scene_dirs: Sequence[str],
    db: ObjectDB,
    log_path: str,
    dataset: str = "APC",
    segmentation_mode: str = "GT",
    verification_mode: str = "LCP",
    hypothesis_mode: str = "PCS",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = 0,
    add_threshold: float = 0.02,
    mesh=None,
    emd_exact: bool = False,
) -> Dict[str, float]:
    """Sweep scenes, append per-scene JSONL, return aggregate metrics.

    Re-running with the same log_path resumes: scenes already logged are
    skipped (crash-safe per-scene checkpointing).

    mesh: a jax.sharding.Mesh switches LCP/MCTS-mode sweeps to the
    data-parallel path (parallel/scene_sweep.py): all pending scenes'
    (scene, object) jobs run as ONE device program sharded across the mesh,
    and in MCTS mode the per-scene searches then share leaf-eval dispatches
    through one MultiSceneLeafEvaluator - BASELINE config 5 (scenes/sec
    across a multi-chip slice). Results match the serial path
    (tests/test_scene_sweep.py).
    """
    done = completed_scenes(log_path)
    rows: List[dict] = []
    pending = [sd for sd in scene_dirs if sd not in done]

    def write_row(sd: str, result, seconds: float, extra: Optional[dict] = None):
        sc = scene_mod.load_scene(sd, dataset=dataset)
        row = {"scene": sd, "seconds": seconds, "objects": {}}
        if extra:
            row.update(extra)
        for est in result.objects:
            entry: dict = {"score": est.score}
            if sc.gt_poses and est.name in sc.gt_poses:
                entry.update(
                    _metrics_for(
                        est, sc.gt_poses[est.name], db[est.name],
                        emd_exact=emd_exact,
                    )
                )
            row["objects"][est.name] = entry
        with open(log_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        rows.append(row)

    if mesh is not None and verification_mode in ("LCP", "MCTS") and pending:
        from physimglobalpose_tpu.parallel import scene_sweep

        t0 = time.perf_counter()
        results = scene_sweep.sweep_scenes(
            mesh, pending, db, dataset=dataset,
            segmentation_mode=segmentation_mode, cfg=cfg, seed=seed,
            verification_mode=verification_mode,
            hypothesis_mode=hypothesis_mode,
        )
        batch_total_s = time.perf_counter() - t0
        per_scene_s = batch_total_s / max(len(pending), 1)
        for sd in pending:
            # Sharded rows carry batch-averaged timing, not a true per-scene
            # wall time; label them so downstream aggregation can tell the two
            # timing semantics apart when serial and sharded runs share a log.
            write_row(
                sd, results[sd], per_scene_s,
                extra={
                    "scenes_per_sec": results[sd].timings.get("scenes_per_sec"),
                    "sharded": True,
                    "batch_scenes": len(pending),
                    "seconds_batch_total": batch_total_s,
                },
            )
        pending = []

    for sd in pending:
        t0 = time.perf_counter()
        result = api.estimate_pose(
            sd, db, dataset=dataset,
            segmentation_mode=segmentation_mode,
            verification_mode=verification_mode,
            hypothesis_mode=hypothesis_mode,
            cfg=cfg, seed=seed, write_result=False,
        )
        write_row(sd, result, time.perf_counter() - t0)

    # Aggregate over the entire log (old + new rows).
    all_rows = []
    with open(log_path) as fh:
        for line in fh:
            try:
                all_rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    adds_all, add_all, secs = [], [], []
    for row in all_rows:
        secs.append(row.get("seconds", 0.0))
        for entry in row.get("objects", {}).values():
            if "adds_m" in entry:
                adds_all.append(entry["adds_m"])
                add_all.append(entry["add_m"])
    agg = {
        "scenes": float(len(all_rows)),
        "mean_seconds": float(np.mean(secs)) if secs else 0.0,
    }
    if adds_all:
        agg.update(
            {
                "mean_adds_m": float(np.mean(adds_all)),
                "mean_add_m": float(np.mean(add_all)),
                "adds_within_2cm": float(np.mean(np.asarray(adds_all) < add_threshold)),
            }
        )
    return agg


def main(argv=None):
    """Dataset-sweep CLI: ADD/ADD-S aggregates over many scene dirs.

    python -m physimglobalpose_tpu.pipeline.evaluate \
        --scenes /data/scenes/scene_* --log /tmp/eval.jsonl \
        --obj-config obj_config.yml --model-dir meshes/ [--sharded]
    """
    import argparse
    import glob as glob_mod

    p = argparse.ArgumentParser(description="dataset sweep with ADD/ADD-S")
    p.add_argument("--scenes", nargs="+", required=True,
                   help="scene dirs (globs ok)")
    p.add_argument("--log", required=True, help="JSONL log (resume-safe)")
    p.add_argument("--obj-config", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--dataset", default="APC", choices=["APC", "YCB"])
    p.add_argument("--segmentation", default="GT")
    p.add_argument("--verification", default="LCP",
                   choices=["LCP", "MCTS", "GREEDY"])
    p.add_argument("--hypothesis", default="PCS",
                   choices=["PCS", "CONGRUENT_SET_MATCHING", "SUPER4PCS",
                            "V4PCS", "PPF_VOTING", "Hough"])
    p.add_argument("--cache-dir", default="/tmp/physim_tpu_cache")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sharded", action="store_true",
                   help="shard (scene, object) jobs over the device mesh; in "
                        "MCTS mode the scenes' searches additionally share "
                        "leaf-eval dispatches (scene_sweep.sweep_scenes)")
    p.add_argument("--preset", default="default", choices=["default", "small"],
                   help="'small' shrinks the static-shape caps (fast compile)")
    p.add_argument("--emd-exact", action="store_true",
                   help="add exact transportation-LP EMD per object "
                        "(reference cv::EMD semantics; host-side, offline)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from physimglobalpose_tpu.models import objectdb

    if args.preset == "small":
        from physimglobalpose_tpu.config import PreprocessConfig, StoCSConfig

        cfg = PipelineConfig(
            preprocess=PreprocessConfig(max_segment_points=512),
            stocs=StoCSConfig(num_bases=48, max_quads_per_base=32,
                              max_pairs_per_ppf=128),
            max_model_points=512,
            max_validation_points=1024,
        )
    else:
        cfg = DEFAULT_CONFIG
    dirs = sorted(set(sum((glob_mod.glob(s) or [s] for s in args.scenes), [])))
    sc0 = scene_mod.load_scene(dirs[0], dataset=args.dataset)
    db = objectdb.load_object_db(
        args.obj_config, args.model_dir, config=cfg, cache_dir=args.cache_dir,
        only=sc0.object_names if len(dirs) == 1 else None,
    )
    mesh = None
    if args.sharded:
        from physimglobalpose_tpu.parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh()
    agg = evaluate_scenes(
        dirs, db, args.log, dataset=args.dataset,
        segmentation_mode=args.segmentation,
        verification_mode=args.verification,
        hypothesis_mode=args.hypothesis,
        cfg=cfg, seed=args.seed, mesh=mesh, emd_exact=args.emd_exact,
    )
    print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
