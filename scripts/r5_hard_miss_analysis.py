"""Per-miss analysis of the hard-family MCTS >2 cm cases (VERDICT r4 #2).

For each named (scene, object) miss this measures WHERE the 2 cm is lost:

1. segment support: visible points of the object after GT segmentation
   (the hard scenes occlude up to 88%).
2. hypothesis ceiling: the minimum folded ADD-S over the top-25 branch set
   the search chooses from - if > 2 cm, no search policy can fix it.
3. refinement basin from GT: run the final-state TrICP starting AT the GT
   pose. If it walks AWAY from GT (or the GT pose's render cost exceeds the
   chosen pose's), the observed segment+depth data do not support the GT
   pose better than the reported one - a data ceiling, not a search bug.
4. which final-state candidate won (raw / tricp->settle / settle->tricp)
   and the three costs.
5. THE DECISIVE PROBE - joint cost substitution: the full-scene MCTS result
   with each missed object's pose swapped for GT, costed at the search
   render scale AND full resolution. If the GT-substituted assignment does
   not cost LESS at full resolution, the reference's own objective
   (explained pixels, UCTState::computeCost) cannot see the fix: the miss
   is occlusion-unobservable, and no search/refinement on that objective
   can reliably do better. Round-5 measurement: expo scene_0004 is
   cost-IDENTICAL under substitution at every scale (fully occluded
   fragment) and gt_all costs MORE - the 3 remaining misses are a data
   ceiling, which is why cfg.mcts.final_polish ships disabled.

Writes HARD_MISS_ANALYSIS.json.

Run after scripts/r4_hard_eval.py (same scene dir):
  python scripts/r5_hard_miss_analysis.py [--platform cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = (
    "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"
)
OBJECTS = ["kleenex_tissue_box", "expo_dry_erase_board_eraser",
           "folgers_classic_roast_coffee"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/hard_scenes_r4")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log", default="/tmp/hard_eval_MCTS_0.jsonl",
                    help="the hard-eval MCTS log; misses > threshold are "
                         "analyzed")
    ap.add_argument("--threshold", type=float, default=0.02)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "HARD_MISS_ANALYSIS.json"))
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
    from physimglobalpose_tpu.geometry import metrics, se3
    from physimglobalpose_tpu.models import objectdb
    from physimglobalpose_tpu.pipeline import api, mcts as mcts_mod
    from physimglobalpose_tpu.pipeline import scene as scene_mod
    from physimglobalpose_tpu.pipeline import segmentation

    cfg = PipelineConfig(
        preprocess=PreprocessConfig(max_segment_points=512),
        stocs=StoCSConfig(num_bases=48, max_quads_per_base=32,
                          max_pairs_per_ppf=128),
        max_model_points=512,
        max_validation_points=1024,
    )
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=cfg, cache_dir="/tmp/ppf_cache", only=OBJECTS,
    )

    # Misses from the eval log.
    misses = []
    with open(args.log) as fh:
        for line in fh:
            row = json.loads(line)
            for name, entry in row["objects"].items():
                if entry.get("adds_m", 0.0) > args.threshold:
                    misses.append((row["scene"], name, entry["adds_m"]))
    print(f"analyzing {len(misses)} misses > {args.threshold*100:.0f} mm:",
          misses, flush=True)

    def adds(obj, pose_cam, gt_cam):
        pts = obj.validation_pts[:1024]
        a = pts @ np.asarray(pose_cam)[:3, :3].T + np.asarray(pose_cam)[:3, 3]
        b = pts @ np.asarray(gt_cam)[:3, :3].T + np.asarray(gt_cam)[:3, 3]
        d = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1))
        return float(d.min(1).mean())

    report = {"meta": {"log": args.log, "threshold_m": args.threshold,
                       "seed": args.seed}}
    for scene_dir, name, adds_m in misses:
        sc = scene_mod.load_scene(scene_dir, dataset="APC")
        obj = db[name]
        gt_cam = np.linalg.inv(np.asarray(sc.cam_pose, np.float64)) @ (
            np.asarray(sc.gt_poses[name], np.float64))
        gt_cam = gt_cam.astype(np.float32)

        # Re-run the pipeline to the MCTS stage deterministically (the eval
        # used estimate_pose(seed=0) - same flow).
        res = api.estimate_pose(
            scene_dir, db, dataset="APC", segmentation_mode="GT",
            verification_mode="LCP", cfg=cfg, seed=args.seed,
            write_result=False,
        )
        est = res.pose_of(name)

        # 1. segment support.
        key = jax.random.key(args.seed)
        k_table, key = jax.random.split(key)
        depth_clean, _pl, _tp = scene_mod.remove_table(
            jnp.asarray(sc.depth), jnp.asarray(sc.intrinsics), k_table, cfg
        )
        prob = segmentation.gt_prob_images(sc.class_mask, [obj.class_id])
        seg = segmentation.compute_3d_segment(
            depth_clean, jnp.asarray(prob[obj.class_id]),
            jnp.asarray(sc.intrinsics), jax.random.key(1), cfg
        )
        n_seg = int(np.asarray(seg.mask).sum())

        # 2. hypothesis ceiling over the branch set (pre-settle, folded).
        hyp_errs = []
        for h_i in range(len(est.hypotheses)):
            hyp_errs.append(adds(obj, est.hypotheses[h_i], gt_cam))
        hyp_errs = np.asarray(hyp_errs)

        # 3 + 4. final-state candidates from the CHOSEN pose and from GT.
        ests = [est]
        hyp_world, hyp_scores, obj_hulls = mcts_mod._scene_search_inputs(
            ests, sc, db, cfg
        )
        table_pose = np.array(
            se3.to_world(jnp.asarray(_tp), jnp.asarray(sc.cam_pose)))
        if table_pose[2, 2] < 0:
            table_pose[:3, 1] *= -1.0
            table_pose[:3, 2] *= -1.0
        table_pose[:3, 3] -= (
            cfg.physics.table_half_extents[2] * table_pose[:3, 2])
        ev = mcts_mod.BatchedLeafEvaluator(
            obj_hulls, hyp_world, np.asarray(depth_clean), sc.intrinsics,
            sc.cam_pose, table_pose, cfg,
        )
        seg_pts = np.asarray(seg.pts)[None]
        seg_mask = np.asarray(seg.mask)[None]

        def final3(pose_cam):
            hw = np.einsum("ij,jk->ik", np.asarray(sc.cam_pose, np.float64),
                           np.asarray(pose_cam, np.float64)).astype(np.float32)
            ev.hyp_world = jnp.asarray(hw[None, None].repeat(
                hyp_world.shape[1], 1))
            ev.consts_full = dict(ev.consts_full, hyp_world=ev.hyp_world)
            costs3, settled3 = ev.evaluate_final_tricp(
                np.array([0]), np.ones(1, bool), seg_pts, seg_mask
            )
            cam_inv = np.linalg.inv(np.asarray(sc.cam_pose, np.float64))
            out = []
            for i in range(3):
                pc = (cam_inv @ np.asarray(settled3[i, 0], np.float64)).astype(
                    np.float32)
                out.append({"cost": float(costs3[i]),
                            "adds_m": round(adds(obj, pc, gt_cam), 4)})
            return out, int(np.argmin(costs3))

        from_chosen, win_c = final3(est.pose_cam)
        from_gt, win_g = final3(gt_cam)

        rot, tr = metrics.pose_error(
            jnp.asarray(est.pose_cam), jnp.asarray(gt_cam),
            jnp.asarray(obj.symmetry))

        report[f"{os.path.basename(scene_dir)}/{name}"] = {
            "eval_adds_m": adds_m,
            "segment_points": n_seg,
            "lcp_pose_folded": {"rot_deg": round(float(rot), 2),
                                "trans_m": round(float(tr), 4)},
            "branch_set_adds_m": {
                "min": round(float(hyp_errs.min()), 4),
                "chosen_rank0": round(float(hyp_errs[0]), 4),
                "n_within_2cm": int((hyp_errs < 0.02).sum()),
            },
            "final3_from_chosen": {
                "candidates": from_chosen, "winner": win_c},
            "final3_from_gt": {
                "candidates": from_gt, "winner": win_g},
            "verdict_hint": (
                "hypothesis ceiling" if hyp_errs.min() > 0.02 else
                ("data ceiling (GT-start refines away or costs more)"
                 if from_gt[win_g]["adds_m"] > 0.01
                 or from_gt[win_g]["cost"] >= from_chosen[win_c]["cost"]
                 else "search/refinement gap - fixable")),
        }
        print(json.dumps(report[f"{os.path.basename(scene_dir)}/{name}"],
                         indent=1), flush=True)

    # 5. Joint cost substitution on every miss scene (see module docstring).
    for scene_dir in sorted({sd for sd, _n, _a in misses}):
        sc = scene_mod.load_scene(scene_dir, dataset="APC")
        res = api.estimate_pose(
            scene_dir, db, dataset="APC", segmentation_mode="GT",
            verification_mode="MCTS", cfg=cfg, seed=args.seed,
            write_result=False,
        )
        chosen_w = np.stack([np.asarray(o.pose_world, np.float64)
                             for o in res.objects])
        gt_w = np.stack([np.asarray(sc.gt_poses[o.name], np.float64)
                         for o in res.objects])
        key = jax.random.key(args.seed)
        k_table, key = jax.random.split(key)
        depth_clean, _pl, tp = scene_mod.remove_table(
            jnp.asarray(sc.depth), jnp.asarray(sc.intrinsics), k_table, cfg)
        table_pose = np.array(
            se3.to_world(tp, jnp.asarray(sc.cam_pose)))
        if table_pose[2, 2] < 0:
            table_pose[:3, 1] *= -1.0
            table_pose[:3, 2] *= -1.0
        table_pose[:3, 3] -= (
            cfg.physics.table_half_extents[2] * table_pose[:3, 2])
        hyp_world, _hs, obj_hulls = mcts_mod._scene_search_inputs(
            res.objects, sc, db, cfg)
        rows = {"chosen": chosen_w, "gt_all": gt_w}
        for oi, o in enumerate(res.objects):
            sub = chosen_w.copy()
            sub[oi] = gt_w[oi]
            rows[f"gt_{o.name}"] = sub
        entry = {}
        for scale in (cfg.mcts.render_scale, 1):
            ev = mcts_mod.BatchedLeafEvaluator(
                obj_hulls, hyp_world, np.asarray(depth_clean), sc.intrinsics,
                sc.cam_pose, table_pose, cfg, render_scale=scale)
            act = np.ones(len(res.objects), bool)
            entry[f"scale_{scale}"] = {
                label: float(np.asarray(mcts_mod._poses_cost_jit(
                    ev.consts_full, cfg, ev.h, ev.w, ev.splat_radius,
                    jnp.asarray(poses.astype(np.float32))[None],
                    jnp.asarray(act)))[0])
                for label, poses in rows.items()
            }
        report[f"{os.path.basename(scene_dir)}/joint_cost_substitution"] = entry
        print(os.path.basename(scene_dir), "joint substitution:",
              json.dumps(entry), flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
