"""Real-frame FCN->pose failure diagnosis (VERDICT r4 #3 / Weak #2).

On the bundled real frame, the prior+TTA FCN reaches mIoU 0.469 but the
downstream poses are wrong for expo (66-76 deg folded) and kleenex
(12-17 deg). This script isolates WHERE the pose goes wrong by swapping one
stage at a time between the FCN path and the known-good GT-mask path and
scoring each variant's final pose against the golden GT-segmentation poses
(tests/golden/bundled_scene_world_poses.json):

  gt          GT prob images end to end            (sanity: must match golden)
  fcn         FCNThreshold probs as-is             (the failing configuration)
  fcn_gtsup   FCN probs zeroed outside the GT mask (support errors removed ->
              if this fixes the pose, FALSE-POSITIVE pixels are the cause)
  gt_flat     GT support with uniform prob 1       (prob-calibration control)
  fcn_cc      FCN probs, largest connected component per class (cleanup fix)
  fcn_sharp   FCN probs squared then renormalized  (calibration fix)

Per variant and object: 2D mask stats (IoU, false-positive fraction), 3D
segment stats (points, centroid offset vs the GT segment), and the final
folded pose error vs golden. Writes FCN_POSE_DIAG.json.

Run: python scripts/r5_fcn_pose_diag.py [--platform cpu] [--variant prior]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = (
    "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"
)


def largest_component(hard: "np.ndarray") -> "np.ndarray":
    """Keep the largest 4-connected component of a boolean mask."""
    from physimglobalpose_tpu.pipeline.detector import connected_components

    labels = connected_components(hard)
    if labels.max() == 0:
        return hard
    import numpy as np

    sizes = np.bincount(labels.ravel())
    sizes[0] = 0
    return labels == sizes.argmax()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--variant", default="prior")
    ap.add_argument("--tta", action="store_true", default=True)
    ap.add_argument("--no-tta", dest="tta", action="store_false")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "FCN_POSE_DIAG.json"))
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from physimglobalpose_tpu.config import (
        PipelineConfig, PreprocessConfig, StoCSConfig,
    )
    from physimglobalpose_tpu.geometry import metrics
    from physimglobalpose_tpu.models import fcn as fcn_mod, objectdb
    from physimglobalpose_tpu.pipeline import api, scene as scene_mod
    from physimglobalpose_tpu.pipeline import segmentation

    cfg = PipelineConfig(
        preprocess=PreprocessConfig(max_segment_points=512),
        stocs=StoCSConfig(num_bases=48, max_quads_per_base=32,
                          max_pairs_per_ppf=128),
        max_model_points=512,
        max_validation_points=1024,
    )
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=cfg, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    sc = scene_mod.load_scene(SCENE, dataset="APC")
    class_ids = [db.class_of(n) for n in sc.object_names]
    names_by_class = {db.class_of(n): n for n in sc.object_names}

    with open(os.path.join(REPO, "tests", "golden",
                           "bundled_scene_world_poses.json")) as fh:
        golden = {k: np.asarray(v, np.float32) for k, v in json.load(fh).items()}

    pred = fcn_mod.load_shipped_predictor(
        variant=args.variant,
        tta_scales=(0.5, 0.75, 1.0) if args.tta else (1.0,),
    )
    raw_probs = pred(sc.color, class_ids)
    gt_probs = segmentation.gt_prob_images(sc.class_mask, class_ids)
    # The production FCNThreshold gate (Segmentation.cpp:96-182 semantics).
    fcn_probs = segmentation.build_prob_images(
        "FCNThreshold", class_ids, nn_predictor=lambda c, w: raw_probs,
        color=sc.color, threshold=cfg.preprocess.background_prob,
    )

    def mask_stats(p, cid):
        gt = gt_probs[cid] > 0
        got = p > 0
        inter = (gt & got).sum()
        union = (gt | got).sum()
        return {
            "pixels": int(got.sum()),
            "gt_pixels": int(gt.sum()),
            "iou": round(float(inter / max(union, 1)), 3),
            "false_pos_frac": round(
                float((got & ~gt).sum() / max(got.sum(), 1)), 3
            ),
            "prob_mass_outside_gt": round(
                float(p[~gt].sum() / max(p.sum(), 1e-6)), 3
            ),
        }

    variants = {
        "gt": gt_probs,
        "fcn": fcn_probs,
        "fcn_gtsup": {
            c: np.where(gt_probs[c] > 0, fcn_probs[c], 0.0).astype(np.float32)
            for c in class_ids
        },
        "gt_flat": {
            c: (gt_probs[c] > 0).astype(np.float32) for c in class_ids
        },
        "fcn_cc": {
            c: np.where(
                largest_component(fcn_probs[c] > 0), fcn_probs[c], 0.0
            ).astype(np.float32)
            for c in class_ids
        },
        "fcn_sharp": {
            c: (fcn_probs[c] ** 2 / max(fcn_probs[c].max(), 1e-6)).astype(
                np.float32
            )
            for c in class_ids
        },
    }

    # GT 3D segment centroids (the reference support for stage-3 stats).
    key = jax.random.key(args.seed)
    k_table, key = jax.random.split(key)
    depth_clean, _plane, _tp = scene_mod.remove_table(
        jnp.asarray(sc.depth), jnp.asarray(sc.intrinsics), k_table, cfg
    )
    intr = jnp.asarray(sc.intrinsics)

    def seg_stats(probs):
        out = {}
        k_seg = jax.random.key(123)
        for cid in class_ids:
            seg = segmentation.compute_3d_segment(
                depth_clean, jnp.asarray(probs[cid]), intr, k_seg, cfg
            )
            m = np.asarray(seg.mask)
            pts = np.asarray(seg.pts)[m]
            out[cid] = {
                "points": int(m.sum()),
                "centroid": pts.mean(0).tolist() if m.any() else None,
            }
        return out

    gt_seg = seg_stats(gt_probs)

    report = {"meta": {
        "variant": args.variant, "tta": args.tta, "seed": args.seed,
        "threshold": cfg.preprocess.background_prob,
        "golden": "tests/golden/bundled_scene_world_poses.json",
    }}
    for vname, probs in variants.items():
        t0 = time.time()
        res = api.estimate_pose(
            SCENE, db, dataset="APC", segmentation_mode="FCN",
            hypothesis_mode="PCS", verification_mode="LCP", cfg=cfg,
            seed=args.seed, write_result=False,
            nn_predictor=lambda c, w, _p=probs: _p,
        )
        segs = seg_stats(probs)
        row = {}
        for obj in res.objects:
            cid = db.class_of(obj.name)
            rot, tr = metrics.pose_error(
                jnp.asarray(obj.pose_world), jnp.asarray(golden[obj.name]),
                jnp.asarray(db[obj.name].symmetry),
            )
            seg_entry = dict(segs[cid])
            if seg_entry["centroid"] and gt_seg[cid]["centroid"]:
                seg_entry["centroid_off_gt_m"] = round(float(
                    np.linalg.norm(np.asarray(seg_entry["centroid"])
                                   - np.asarray(gt_seg[cid]["centroid"]))), 4)
            row[obj.name] = {
                "mask": mask_stats(probs[cid], cid),
                "segment": seg_entry,
                "pose_vs_golden": {
                    "rot_deg": round(float(rot), 2),
                    "trans_m": round(float(tr), 4),
                },
                "score": round(obj.score, 4),
            }
        row["wall_s"] = round(time.time() - t0, 1)
        report[vname] = row
        print(vname, json.dumps(
            {k: v["pose_vs_golden"] for k, v in row.items()
             if isinstance(v, dict) and "pose_vs_golden" in v}), flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
