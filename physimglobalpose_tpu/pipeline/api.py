"""Public API: estimate_pose — the /pose_estimation service contract.

Reference: the ROS service EstimateObjectPose.srv takes (OperationMode,
SceneFiles, SegmentationMode, HypothesisGenerationMode,
HypothesisVerificationMode) and returns per-object label+pose, also writing
result.txt (main.cpp:86-171, srv/EstimateObjectPose.srv:1-8). Here the same
contract is a plain function: scene dir in, per-object camera- and
world-frame poses out, result.txt in the reference's format.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Dict, List, Optional

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.geometry import se3
from physimglobalpose_tpu.models.objectdb import ObjectDB
from physimglobalpose_tpu.pipeline import hypothesis, scene as scene_mod, segmentation
from physimglobalpose_tpu.pipeline.selection import lcp_select
from physimglobalpose_tpu.utils.tracing import trace_span, get_tracer


@functools.partial(jax.jit, static_argnames=("top_k",))
def _finalize_hypotheses_batch(
    transforms, scores, best_transform, best_score, cam_pose, top_k
):
    """Per-object estimate fields for the batched branch, flat-packed so the
    host pays ONE fetch.

    Each np.asarray(jax op) on the axon backend is a synchronous ~31 ms
    dispatch+fetch round trip (CLAUDE.md); the previous per-object loop paid
    ~5 of them per object (top-k transforms/scores, lcp_select, to_world,
    best_score) - ~0.5 s of pure tunnel latency on a 3-object scene.
    Returns [K, top_k*16 + top_k + 16 + 16 + 1] f32 rows:
    (top_tf, top_scores, pose_cam, pose_world, best_score).
    """

    def one(tf_i, sc_i, bt_i, bs_i):
        top_scores, idx = jax.lax.top_k(sc_i, top_k)
        top_tf = tf_i[idx]
        pose_cam = jnp.where(bs_i > 0, bt_i, jnp.eye(4))  # selection.lcp_select
        pose_world = cam_pose @ pose_cam  # se3.to_world
        return top_tf, top_scores, pose_cam, pose_world, bs_i

    top_tf, top_scores, pose_cam, pose_world, best = jax.vmap(one)(
        transforms, scores, best_transform, best_score
    )
    k = transforms.shape[0]
    return jnp.concatenate(
        [
            top_tf.reshape(k, -1), top_scores.reshape(k, -1),
            pose_cam.reshape(k, -1), pose_world.reshape(k, -1),
            best.reshape(k, 1),
        ],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("iters", "trim_fraction", "max_corr_dist", "point_to_plane"),
)
def _refine_final_batch(
    poses, model_pts, model_nrm, seg_pts, seg_mask, cam_pose,
    iters, trim_fraction, max_corr_dist, point_to_plane,
):
    """Final ICP polish for ALL objects in one device program + one fetch
    (the per-object loop paid ~3 axon round trips per object).
    Returns [K, 32] rows: (pose_cam, pose_world) flattened."""
    from physimglobalpose_tpu.ops import icp as icp_mod

    def one(pose, mp, mn, sp, sm):
        return icp_mod.refine_icp(
            pose[None], mp, mn, sp, sm, iters=iters,
            trim_fraction=trim_fraction, max_corr_dist=max_corr_dist,
            point_to_plane=point_to_plane,
        )[0]

    refined = jax.vmap(one)(poses, model_pts, model_nrm, seg_pts, seg_mask)
    world = jnp.einsum("ij,kjl->kil", cam_pose, refined)
    k = poses.shape[0]
    return jnp.concatenate([refined.reshape(k, 16), world.reshape(k, 16)], axis=1)


@dataclasses.dataclass
class ObjectPoseEstimate:
    name: str
    pose_cam: np.ndarray  # [4, 4] object pose in camera frame
    pose_world: np.ndarray  # [4, 4]
    score: float
    hypotheses: Optional[np.ndarray] = None  # [K, 4, 4] top-k (camera frame)
    hypothesis_scores: Optional[np.ndarray] = None  # [K]


@dataclasses.dataclass
class PoseEstimationResult:
    objects: List[ObjectPoseEstimate]
    timings: Dict[str, float]

    def pose_of(self, name: str) -> ObjectPoseEstimate:
        return next(o for o in self.objects if o.name == name)


def default_result_path(scene_dir: str) -> str:
    """Where result.txt goes when the caller gave no path.

    Prefer the scene directory (the reference writes result.txt next to the
    frames, main.cpp:160-165); fall back to the cwd when the scene is
    read-only. NOTE: os.access(W_OK) is useless for that check when running
    as root (root passes every permission check even on r-x directories), so
    the mode bit of the class that applies to THIS process (owner/group/
    other) is required too - a dataset directory marked read-only must never
    be written into regardless of privilege.
    """
    import stat as _stat

    try:
        st = os.stat(scene_dir)
        if st.st_uid == os.geteuid():
            bit = _stat.S_IWUSR
        elif st.st_gid == os.getegid() or st.st_gid in os.getgroups():
            bit = _stat.S_IWGRP
        else:
            bit = _stat.S_IWOTH
        writable = bool(st.st_mode & bit) and os.access(scene_dir, os.W_OK)
    except OSError:
        writable = False
    return (
        os.path.join(scene_dir, "result.txt")
        if writable
        else os.path.abspath("result.txt")
    )


def write_result_txt(path: str, result: PoseEstimationResult) -> None:
    """result.txt in the reference format: 'name trans... quat(x y z w)' rows.

    (main.cpp:150-166 writes name, translation, quaternion per object.)
    """
    with open(path, "w") as fh:
        for obj in result.objects:
            pose = obj.pose_world
            q = np.asarray(se3.matrix_to_quat(jnp.asarray(pose[:3, :3])))
            t = pose[:3, 3]
            fh.write(
                f"{obj.name} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )


def estimate_pose(
    scene_dir: str,
    db: ObjectDB,
    dataset: str = "APC",
    segmentation_mode: str = "GT",
    hypothesis_mode: str = "PCS",
    verification_mode: str = "LCP",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = 0,
    nn_predictor=None,
    detector=None,
    top_k: int = 25,
    refine_final: bool = True,
    write_result: bool = True,
    result_path: Optional[str] = None,
    debug_dir: Optional[str] = None,
    scene: Optional["scene_mod.Scene"] = None,
    fcn_variant: str = "small",
    fcn_tta: bool = False,
) -> PoseEstimationResult:
    """Estimate 6D poses for every object in a scene.

    Mirrors estimatePose (main.cpp:86-171): load scene -> remove table ->
    segment -> per-object hypothesis generation -> selection -> world frame.
    refine_final adds a batched point-to-plane ICP polish of each selected
    pose (the reference keeps its equivalent refinement commented out,
    HypothesisSelection.cpp:120-151; here it is first-class and on by
    default - disable for strict reference behavior).
    """
    from physimglobalpose_tpu.utils.debug import DebugDump

    dbg = DebugDump(debug_dir)
    tracer = get_tracer()
    timings: Dict[str, float] = {}
    t0 = time.perf_counter()

    with trace_span(tracer, "load_scene"):
        # A pre-built Scene (scene_from_arrays - the CAM live-capture path,
        # CAMSceneCfg analogue) bypasses the directory loader.
        sc = scene if scene is not None else scene_mod.load_scene(scene_dir, dataset=dataset)
    key = jax.random.key(seed)

    with trace_span(tracer, "remove_table"):
        k_table, key = jax.random.split(key)
        depth_clean, _plane, table_pose = scene_mod.remove_table(
            jnp.asarray(sc.depth), jnp.asarray(sc.intrinsics), k_table, cfg
        )
    timings["preprocess_s"] = time.perf_counter() - t0
    dbg.depth("depth_clean", depth_clean)

    if segmentation_mode in ("FCN", "FCNThreshold") and nn_predictor is None:
        # No injected predictor: serve the shipped checkpoint (the analogue
        # of the reference node loading apc_weights.hdf5, predict:59).
        # "small" = 2.1 M-param fast default; "full" = full-width
        # AtrousFCN_Vgg16_16s (models/fcn.py _SHIPPED_CKPTS).
        from physimglobalpose_tpu.models import fcn as fcn_mod

        # fcn_tta: multi-scale prob averaging in one device program - the
        # measured real-imagery transfer win (fcn.make_predictor docstring).
        nn_predictor = fcn_mod.load_shipped_predictor(
            variant=fcn_variant,
            tta_scales=(0.5, 0.75, 1.0) if fcn_tta else (1.0,),
        )
    if segmentation_mode in ("RCNN", "RCNNThreshold") and detector is None:
        # No injected detector: serve the TRAINED detection network when its
        # checkpoint ships (models/detect.py - the reference's Faster-RCNN
        # service slot, bin/detect_bbox); fall back to the shipped FCN as a
        # region scorer on checkouts without it.
        from physimglobalpose_tpu.models import detect as detect_mod
        from physimglobalpose_tpu.pipeline.detector import (
            make_fcn_detector, make_learned_detector,
        )

        if os.path.exists(detect_mod.shipped_checkpoint_path()):
            detector = make_learned_detector()
        else:
            detector = make_fcn_detector()

    with trace_span(tracer, "segmentation"):
        class_ids = [db.class_of(n) for n in sc.object_names]
        prob_images = segmentation.build_prob_images(
            segmentation_mode,
            class_ids,
            class_mask=sc.class_mask,
            nn_predictor=nn_predictor,
            color=sc.color,
            detector=detector,
            threshold=cfg.preprocess.background_prob,
        )

    intr = jnp.asarray(sc.intrinsics)
    estimates: List[ObjectPoseEstimate] = []
    t_hyp = time.perf_counter()
    gen_modes = {
        "PCS": "stocs",
        "CONGRUENT_SET_MATCHING": "stocs",
        "SUPER4PCS": "super4pcs",
        "V4PCS": "v4pcs",
    }
    batchable = (
        hypothesis_mode in gen_modes
        and len(sc.object_names) > 1
        # one device program needs uniform static shapes across objects
        and len({db[n].validation_pts.shape for n in sc.object_names}) == 1
        and len({db[n].search_pts.shape for n in sc.object_names}) == 1
    )

    if batchable:
        with trace_span(tracer, "objects:batched"):
            objs = [db[n] for n in sc.object_names]
            k_batch, key = jax.random.split(key)
            seg_keys = jax.random.split(k_batch, len(objs) + 1)
            segs_list = [
                segmentation.compute_3d_segment(
                    depth_clean, jnp.asarray(prob_images[o.class_id]), intr,
                    seg_keys[i], cfg,
                )
                for i, o in enumerate(objs)
            ]
            segs = jax.tree.map(lambda *xs: jnp.stack(xs), *segs_list)
            segs_by_name = {
                n: jax.tree.map(lambda x: x[i], segs)
                for i, n in enumerate(sc.object_names)
            }
            stacked = hypothesis.stack_object_tables([o.ppf_table for o in objs])
            res_b = hypothesis.generate_hypotheses_batch(
                seg_keys[-1], segs,
                jnp.stack([jnp.asarray(o.search_pts) for o in objs]),
                jnp.stack([jnp.asarray(o.search_mask) for o in objs]),
                stacked,
                jnp.stack([jnp.asarray(o.validation_pts) for o in objs]),
                jnp.stack([jnp.asarray(o.validation_nrm) for o in objs]),
                cfg,
                mode=gen_modes[hypothesis_mode],
            )
            flat = np.asarray(
                _finalize_hypotheses_batch(
                    res_b.transforms, res_b.scores, res_b.best_transform,
                    res_b.best_score, jnp.asarray(sc.cam_pose), top_k,
                )
            )
            tf_sz, ts_sz = top_k * 16, top_k
            for i, name in enumerate(sc.object_names):
                row = flat[i]
                estimates.append(
                    ObjectPoseEstimate(
                        name=name,
                        pose_cam=row[tf_sz + ts_sz : tf_sz + ts_sz + 16].reshape(4, 4),
                        pose_world=row[tf_sz + ts_sz + 16 : tf_sz + ts_sz + 32].reshape(4, 4),
                        score=float(row[-1]),
                        hypotheses=row[:tf_sz].reshape(top_k, 4, 4),
                        hypothesis_scores=row[tf_sz : tf_sz + ts_sz],
                    )
                )
        object_names_left = []
    else:
        object_names_left = list(sc.object_names)
        segs_by_name = {}

    for name in object_names_left:
        obj = db[name]
        with trace_span(tracer, f"object:{name}"):
            k_seg, k_hyp, key = jax.random.split(key, 3)
            prob = jnp.asarray(prob_images[obj.class_id])
            seg = segmentation.compute_3d_segment(depth_clean, prob, intr, k_seg, cfg)
            segs_by_name[name] = seg
            if hypothesis_mode in ("PPF_VOTING", "Hough"):
                res = hypothesis.generate_hypotheses_voting(
                    k_hyp,
                    seg,
                    jnp.asarray(obj.search_pts),
                    jnp.asarray(obj.search_nrm),
                    jnp.asarray(obj.search_mask),
                    obj.ppf_table,
                    jnp.asarray(obj.validation_pts),
                    jnp.asarray(obj.validation_nrm),
                    cfg,
                )
            elif hypothesis_mode in gen_modes:
                res = hypothesis.generate_hypotheses(
                    k_hyp,
                    seg,
                    jnp.asarray(obj.search_pts),
                    jnp.asarray(obj.search_mask),
                    obj.ppf_table,
                    jnp.asarray(obj.validation_pts),
                    jnp.asarray(obj.validation_nrm),
                    cfg,
                    mode=gen_modes[hypothesis_mode],
                )
            else:
                raise ValueError(f"unknown hypothesis mode {hypothesis_mode!r}")
            top_tf, top_scores = hypothesis.top_k_hypotheses(res, top_k)
            pose_cam = np.asarray(lcp_select(res.best_transform, res.best_score))
            pose_world = np.asarray(se3.to_world(jnp.asarray(pose_cam), jnp.asarray(sc.cam_pose)))
            estimates.append(
                ObjectPoseEstimate(
                    name=name,
                    pose_cam=pose_cam,
                    pose_world=pose_world,
                    score=float(res.best_score),
                    hypotheses=np.asarray(top_tf),
                    hypothesis_scores=np.asarray(top_scores),
                )
            )
    timings["hypothesis_s"] = time.perf_counter() - t_hyp

    if refine_final and verification_mode not in ("MCTS", "GREEDY"):
        # The physics-aware searches consume est.hypotheses + scores and
        # OVERWRITE pose_cam/pose_world with the settled chosen assignment
        # (_install_assignment), so a pre-search polish of the best-LCP pose
        # is dead work there; the reference likewise feeds raw hypotheses to
        # UCT (UCTSearch.cpp:56-88).
        from physimglobalpose_tpu.ops import icp as icp_mod

        with trace_span(tracer, "icp_refine"):
            t_icp = time.perf_counter()
            live = [i for i, est in enumerate(estimates) if est.score > 0]
            mp_shapes = {db[estimates[i].name].validation_pts[:1024].shape for i in live}
            sp_shapes = {tuple(segs_by_name[estimates[i].name].pts.shape) for i in live}
            if len(live) > 1 and len(mp_shapes) == 1 and len(sp_shapes) == 1:
                # Uniform shapes: refine every object in one device program
                # with ONE host fetch (per-object dispatch+fetch costs ~31 ms
                # each on the axon backend).
                flat = np.asarray(
                    _refine_final_batch(
                        jnp.asarray(np.stack([estimates[i].pose_cam for i in live])),
                        jnp.stack([jnp.asarray(db[estimates[i].name].validation_pts[:1024]) for i in live]),
                        jnp.stack([jnp.asarray(db[estimates[i].name].validation_nrm[:1024]) for i in live]),
                        jnp.stack([segs_by_name[estimates[i].name].pts for i in live]),
                        jnp.stack([segs_by_name[estimates[i].name].mask for i in live]),
                        jnp.asarray(sc.cam_pose),
                        cfg.icp.iters, cfg.icp.trim_fraction,
                        cfg.icp.max_corr_dist, cfg.icp.point_to_plane,
                    )
                )
                for row_i, i in enumerate(live):
                    estimates[i] = dataclasses.replace(
                        estimates[i],
                        pose_cam=flat[row_i, :16].reshape(4, 4),
                        pose_world=flat[row_i, 16:].reshape(4, 4),
                    )
            else:
                for i in live:
                    est = estimates[i]
                    obj = db[est.name]
                    seg = segs_by_name[est.name]
                    refined = icp_mod.refine_icp(
                        jnp.asarray(est.pose_cam)[None],
                        jnp.asarray(obj.validation_pts[:1024]),
                        jnp.asarray(obj.validation_nrm[:1024]),
                        seg.pts, seg.mask,
                        iters=cfg.icp.iters,
                        trim_fraction=cfg.icp.trim_fraction,
                        max_corr_dist=cfg.icp.max_corr_dist,
                        point_to_plane=cfg.icp.point_to_plane,
                    )
                    pose_cam = np.asarray(refined[0])
                    estimates[i] = dataclasses.replace(
                        est,
                        pose_cam=pose_cam,
                        pose_world=np.asarray(
                            se3.to_world(jnp.asarray(pose_cam), jnp.asarray(sc.cam_pose))
                        ),
                    )
            timings["icp_refine_s"] = time.perf_counter() - t_icp

    if verification_mode in ("MCTS", "GREEDY"):
        from physimglobalpose_tpu.pipeline.mcts import mcts_select

        # Table-pose refinement (getTableParams parity, SceneCfg.cpp:87-157):
        # ICP a canonical table-top cloud against the raw depth's plane
        # inliers before handing the frame to physics.
        k_tbl, key = jax.random.split(key)
        table_pose = scene_mod.refine_table_pose_from_depth(
            jnp.asarray(sc.depth), intr, _plane, table_pose, k_tbl, cfg
        )
        # remove_table fits the plane in CAMERA frame; physics needs the
        # table in WORLD frame (gravity acts along world -z) with its local
        # z pointing up (the contact model treats local +z as the top face).
        table_pose_world = np.array(se3.to_world(table_pose, jnp.asarray(sc.cam_pose)))
        if table_pose_world[2, 2] < 0:
            table_pose_world[:3, 1] *= -1.0  # flip y and z columns:
            table_pose_world[:3, 2] *= -1.0  # still right-handed
        # The fitted frame's origin lies ON the surface; the physics table is
        # a box CENTERED at its pose (PhySim.cpp:22-48) - shift down by the
        # half extent so the box's top face coincides with the surface.
        table_pose_world[:3, 3] -= (
            cfg.physics.table_half_extents[2] * table_pose_world[:3, 2]
        )

        t_mcts = time.perf_counter()
        with trace_span(tracer, "mcts"):
            estimates = mcts_select(
                estimates, sc, db, np.asarray(table_pose_world), depth_clean, cfg,
                seed=seed, search="greedy" if verification_mode == "GREEDY" else "uct",
                # Per-object 3D segments enable the final-pass TrICP
                # refinement (cfg.mcts.tricp_final; UCTState::performTrICP
                # revived - see pipeline/mcts._tricp_final_core).
                segs=[segs_by_name[e.name] for e in estimates],
            )
        timings["search_s"] = time.perf_counter() - t_mcts
    elif verification_mode != "LCP":
        raise ValueError(f"unknown verification mode {verification_mode!r}")

    if dbg.enabled:
        for est in estimates:
            obj = db[est.name]
            dbg.prob_image(est.name, prob_images[obj.class_id])
            dbg.hypotheses(est.name, est.hypotheses, est.hypothesis_scores)
            dbg.info(est.name, {"score": est.score,
                                "pose_world": est.pose_world.tolist()})
        if verification_mode in ("MCTS", "GREEDY") and estimates:
            # Quality render of the FINAL chosen assignment: full-resolution
            # triangle rasterization of the actual meshes (the search-time
            # leaf cost uses the fast point-splat path at render_scale; this
            # is the reference-grade mesh render, depth_sim parity -
            # camera.cpp:31, renderScene.cpp:45-71).
            from physimglobalpose_tpu.models import assets as assets_mod
            from physimglobalpose_tpu.ops import raster as raster_mod
            from physimglobalpose_tpu.ops import raster_tri

            final = jnp.zeros((cfg.render.height, cfg.render.width), jnp.float32)
            for est in estimates:
                mesh = assets_mod.decimate_to_max_faces(db[est.name].mesh, 3000)
                d = raster_tri.render_mesh_depth(
                    jnp.asarray(est.pose_cam.astype(np.float32)),
                    jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                    jnp.ones(len(mesh.faces), bool), intr,
                    cfg.render.height, cfg.render.width,
                )
                final = raster_mod.composite_min(final, d)
            final = jnp.where(final > cfg.render.max_render_depth, 0.0, final)
            dbg.depth("final_assignment_mesh_render", np.asarray(final))
        dbg.overlay(
            "final_overlay", sc.color, sc.intrinsics,
            [db[e.name].validation_pts[:1024] for e in estimates],
            [e.pose_cam for e in estimates],
        )

    timings["total_s"] = time.perf_counter() - t0
    result = PoseEstimationResult(objects=estimates, timings=timings)
    if write_result:
        if result_path is None:
            result_path = default_result_path(scene_dir)
        write_result_txt(result_path, result)
        timings["result_path"] = result_path
    return result
