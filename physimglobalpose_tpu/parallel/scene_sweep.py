"""Multi-scene data-parallel sweep: BASELINE config 5 (scenes/sec).

The reference processes one scene per service call, objects serially
(main.cpp:86-171; per-object threads commented out, SceneCfg.cpp:377,404).
Here a batch of scenes is preprocessed on the host, every (scene, object)
job is flattened into one leading axis, and a single device program runs
StoCS generation + LCP verification + ICP refinement for ALL jobs with that
axis sharded across the mesh - whole scenes ride the "data" axis (jointly
with "model": a job is the unit of data parallelism, so both axes shard it).

Per-job PRNG keys reproduce exactly the key each object would receive from
the serial estimate_pose batched path (api.py:101-166), so sweep results
match the serial pipeline bit-for-bit modulo float reassociation - asserted
by tests/test_scene_sweep.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.geometry import depthio
from physimglobalpose_tpu.models.objectdb import ObjectDB
from physimglobalpose_tpu.ops import icp as icp_mod
from physimglobalpose_tpu.pipeline import hypothesis, scene as scene_mod, segmentation
from physimglobalpose_tpu.pipeline.api import ObjectPoseEstimate, PoseEstimationResult


@dataclasses.dataclass
class _SceneJobs:
    """Host-side record of one preprocessed scene."""

    scene_dir: str
    sc: object  # Scene
    names: List[str]
    segs: object  # Segment3D stacked [K, ...]
    # [K, 2] raw key data (jax.random.key_data). A DEVICE array slice when
    # prepared with fetch_meta=False: the keys are only re-uploaded for the
    # generation program, so fetching them costs a pointless ~31 ms axon
    # round trip per batch (LCP sweeps skip it).
    gen_keys: np.ndarray
    # [4, 4]; device when fetch_meta=False (only MCTS reads it on host).
    table_pose: np.ndarray
    # [H, W] table-removed depth (MCTS leaf obs). May be a device array when
    # prepared with fetch_depth=False (LCP sweeps never read it; fetching
    # 8x640x480 f32 through the ~20 MB/s axon tunnel cost ~0.24 s/batch);
    # every consumer np.asarray()s it.
    depth_clean: np.ndarray


def prepare_scene(
    scene_dir: str,
    db: ObjectDB,
    dataset: str = "APC",
    segmentation_mode: str = "GT",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = 0,
    nn_predictor=None,
    detector=None,
) -> _SceneJobs:
    """Load + preprocess one scene with estimate_pose's exact key flow."""
    sc = scene_mod.load_scene(scene_dir, dataset=dataset)
    key = jax.random.key(seed)
    k_table, key = jax.random.split(key)
    depth_clean, _plane, table_pose = scene_mod.remove_table(
        jnp.asarray(sc.depth), jnp.asarray(sc.intrinsics), k_table, cfg
    )
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
    objs = [db[n] for n in sc.object_names]
    k_batch, key = jax.random.split(key)
    seg_keys = jax.random.split(k_batch, len(objs) + 1)
    intr = jnp.asarray(sc.intrinsics)
    segs_list = [
        segmentation.compute_3d_segment(
            depth_clean, jnp.asarray(prob_images[o.class_id]), intr,
            seg_keys[i], cfg,
        )
        for i, o in enumerate(objs)
    ]
    segs = jax.tree.map(lambda *xs: jnp.stack(xs), *segs_list)
    # The per-object generation key estimate_pose's batched path derives:
    # generate_hypotheses_batch(seg_keys[-1], ...) splits it K ways inside.
    gen_keys = jax.random.split(seg_keys[-1], len(objs))
    return _SceneJobs(
        scene_dir=scene_dir,
        sc=sc,
        names=list(sc.object_names),
        segs=segs,
        gen_keys=np.asarray(jax.random.key_data(gen_keys)),
        table_pose=np.asarray(table_pose),
        depth_clean=np.asarray(depth_clean),
    )


def prepare_scenes(
    scene_dirs: Sequence[str],
    db: ObjectDB,
    dataset: str = "APC",
    segmentation_mode: str = "GT",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = 0,
    nn_predictor=None,
    detector=None,
    fetch_depth: bool = True,
    fetch_meta: bool = True,
) -> List[_SceneJobs]:
    """Batched preprocessing of MANY scenes: one device program per stage.

    The serial prepare_scene pays a ~31 ms dispatch round trip per jitted
    call per scene (remove_table) and per object (compute_3d_segment) -
    host preprocessing dominated the sweep (WHOLE_SCENE_BENCH.json round 3).
    Here all scenes' table removals run as ONE vmapped program and all
    (scene, object) segments as another. The per-scene PRNG key flow is
    identical to prepare_scene (same seed for every scene), so results match
    the serial path bit-for-bit modulo float reassociation
    (tests/test_scene_sweep.py::test_batched_prepare_matches_serial).

    Host<->device traffic is minimized for the axon tunnel (~20 MB/s, ~31 ms
    per round trip - profiled in /tmp-style scripts, see ROUND3_NOTES):
    depth uploads as uint16 codec values decoded on device when exact, GT
    probability images are built ON DEVICE from a small integer class-mask
    upload instead of shipping [jobs, H, W] f32 masks, and the cleaned depth
    stays on device unless fetch_depth=True (only MCTS consumes it).
    """
    if not scene_dirs:
        return []
    # load_scene is pure host work (PIL PNG decode + yaml + numpy): thread
    # it. (jax must NOT be dispatched from worker threads - that deadlocks
    # the axon backend on a futex - but no jax is involved here anymore.)
    from concurrent.futures import ThreadPoolExecutor

    # GT segmentation never reads the color image; skip its decode (the
    # largest per-scene host decode, scripts/profile_prepare.py).
    load_color = segmentation_mode != "GT"
    with ThreadPoolExecutor(max_workers=min(8, len(scene_dirs))) as pool:
        scs = list(
            pool.map(
                lambda sd: scene_mod.load_scene(sd, dataset=dataset, load_color=load_color),
                scene_dirs,
            )
        )
    shape0 = scs[0].depth.shape
    assert all(sc.depth.shape == shape0 for sc in scs), "mixed depth sizes"

    # Per-scene keys: the exact derivation prepare_scene performs.
    k_tables, seg_keys_per_scene, gen_keys_per_scene = [], [], []
    for sc in scs:
        key = jax.random.key(seed)
        k_table, key = jax.random.split(key)
        k_tables.append(k_table)
        k_batch, key = jax.random.split(key)
        seg_keys = jax.random.split(k_batch, len(sc.object_names) + 1)
        seg_keys_per_scene.append(seg_keys)
        gen_keys_per_scene.append(jax.random.split(seg_keys[-1], len(sc.object_names)))

    # Depth upload: ship 2 bytes/px and decode on device. PNG-loaded scenes
    # carry the original uint16 codec values (depth == raw16 / 10000 exactly,
    # geometry/depthio.py); array-built scenes (scene_from_arrays) fall back
    # to a float round-trip check per batch.
    if all(sc.depth_raw16 is not None for sc in scs):
        depths = jnp.asarray(np.stack([sc.depth_raw16 for sc in scs])).astype(
            jnp.float32
        ) / depthio.DEPTH_SCALE
    else:
        depth_np = np.stack([sc.depth for sc in scs])
        raw16 = np.round(depth_np * depthio.DEPTH_SCALE)
        if np.array_equal(
            raw16.astype(np.uint16).astype(np.float32) / depthio.DEPTH_SCALE, depth_np
        ):
            depths = jnp.asarray(raw16.astype(np.uint16)).astype(jnp.float32) / depthio.DEPTH_SCALE
        else:
            depths = jnp.asarray(depth_np)
    intrs = jnp.stack([jnp.asarray(sc.intrinsics) for sc in scs])
    kt = jnp.stack(k_tables)
    depth_clean_b, _planes, table_poses = jax.vmap(
        lambda d, i, k: scene_mod.remove_table(d, i, k, cfg)
    )(depths, intrs, kt)

    # Every (scene, object) segment in one vmapped program. GT probability
    # images ((class_mask == id) * 1.0, gt_prob_images semantics) are built
    # on device from one integer mask per SCENE - the f32 per-JOB stack this
    # replaces was ~30 MB/batch of upload, the dominant sweep preprocessing
    # cost. Other strategies keep the host build_prob_images path (their
    # cost is the predictor, not the upload).
    job_scene: List[int] = []
    job_keys = []
    jkeys = None
    if segmentation_mode == "GT":
        for sc in scs:
            if sc.class_mask is None:
                raise ValueError("GT segmentation needs a class mask")
        masks_np = np.stack([sc.class_mask for sc in scs])
        job_cid: List[int] = []
        for si, sc in enumerate(scs):
            for oi, o in enumerate(sc.object_names):
                job_scene.append(si)
                job_cid.append(db.class_of(o))
                job_keys.append(seg_keys_per_scene[si][oi])
        # uint8 upload only when BOTH the mask values and the compared class
        # ids fit - a class id >= 256 cast to uint8 would wrap and can alias
        # a different class present in the mask.
        u8_ok = (
            masks_np.min(initial=0) >= 0
            and masks_np.max(initial=0) < 256
            and all(0 <= c < 256 for c in job_cid)
        )
        masks_dev = jnp.asarray(
            masks_np.astype(np.uint8) if u8_ok else masks_np.astype(np.int32)
        )
        sidx = jnp.asarray(np.asarray(job_scene))
        cids = jnp.asarray(np.asarray(job_cid, dtype=masks_dev.dtype))
        jkeys = jnp.stack(job_keys)
        segs_all = jax.vmap(
            lambda si, cid, k: segmentation.compute_3d_segment(
                depth_clean_b[si],
                (masks_dev[si] == cid).astype(jnp.float32),
                intrs[si], k, cfg,
            )
        )(sidx, cids, jkeys)
    else:
        job_prob: List[np.ndarray] = []
        for si, sc in enumerate(scs):
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
            for oi, o in enumerate(sc.object_names):
                job_scene.append(si)
                job_prob.append(np.asarray(prob_images[db.class_of(o)]))
                job_keys.append(seg_keys_per_scene[si][oi])
        sidx = jnp.asarray(np.asarray(job_scene))
        probs = jnp.asarray(np.stack(job_prob))
        jkeys = jnp.stack(job_keys)
        segs_all = jax.vmap(
            lambda si, p, k: segmentation.compute_3d_segment(
                depth_clean_b[si], p, intrs[si], k, cfg
            )
        )(sidx, probs, jkeys)

    out: List[_SceneJobs] = []
    ofs = 0
    depth_clean_out = np.asarray(depth_clean_b) if fetch_depth else depth_clean_b
    # fetch_meta=False keeps the per-scene metadata on device (lazy slices):
    # LCP sweeps only re-upload the generation keys and never read the table
    # pose on host, and each np.asarray here is a SYNCHRONOUS axon round trip
    # that also waits out everything queued before it - with both removed the
    # whole prepare is async dispatch, so a pipelined sweep can overlap it
    # with the previous chunk's device program.
    table_poses_np = np.asarray(table_poses) if fetch_meta else table_poses
    gen_keys_flat = jnp.concatenate(
        [jax.random.key_data(g) for g in gen_keys_per_scene]
    )
    if fetch_meta:
        # One fetch for every scene's generation keys (a per-scene np.asarray
        # here was S small synchronous transfers through the axon tunnel).
        gen_keys_flat = np.asarray(gen_keys_flat)
    kofs = 0
    for si, sc in enumerate(scs):
        k = len(sc.object_names)
        segs = jax.tree.map(lambda x: x[ofs : ofs + k], segs_all)
        ofs += k
        out.append(
            _SceneJobs(
                scene_dir=scene_dirs[si],
                sc=sc,
                names=list(sc.object_names),
                segs=segs,
                gen_keys=gen_keys_flat[kofs : kofs + k],
                table_pose=table_poses_np[si],
                depth_clean=depth_clean_out[si],
            )
        )
        kofs += k
    return out


def _job_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[0] = ("data", "model")
    return NamedSharding(mesh, P(*spec))


def _dispatch_jobs(
    mesh: Optional[Mesh],
    prepared: List[_SceneJobs],
    db: ObjectDB,
    cfg: PipelineConfig,
    gen_mode: str,
    top_k: int,
    do_refine: bool,
    use_pallas: bool | None,
) -> dict:
    """Flatten (scene, object) jobs and dispatch generation + scoring (+
    refinement) for one batch of prepared scenes. NO synchronous fetches:
    every device value is left lazy and the results are packed into ONE
    array handle, so (a) finalizing costs a single axon round trip instead
    of four, and (b) a pipelined caller can overlap the next chunk's host
    preprocessing + uploads with this chunk's device program (transfers and
    kernels overlap on the axon backend - scripts/r3_sweep_overlap_probe.py
    measured both ~= max, not sum).
    """
    # Object clouds are host numpy: stack them on the host and upload ONCE
    # per array (the previous per-job jnp.asarray + device jnp.stack issued
    # ~4 uploads per job through the axon tunnel). Segments are already
    # stacked per scene on device, so the job axis is one concatenate per
    # leaf, not J slice+restack dispatches.
    job_names: List[tuple] = []  # (scene_idx, obj_idx, name)
    tables = []
    search_pts, search_mask, val_pts, val_nrm = [], [], [], []
    for si, pj in enumerate(prepared):
        for oi, name in enumerate(pj.names):
            obj = db[name]
            job_names.append((si, oi, name))
            tables.append(obj.ppf_table)
            search_pts.append(obj.search_pts)
            search_mask.append(obj.search_mask)
            val_pts.append(obj.validation_pts)
            val_nrm.append(obj.validation_nrm)
    j = len(job_names)
    if j == 0:
        return dict(job_names=job_names, prepared=prepared, packed=None,
                    top_k=top_k)

    # Pad the job axis to a multiple of the mesh size (repeat job 0; padded
    # rows are computed and discarded).
    n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    pad = (-j) % n_dev
    for _ in range(pad):
        tables.append(tables[0])
        search_pts.append(search_pts[0])
        search_mask.append(search_mask[0])
        val_pts.append(val_pts[0])
        val_nrm.append(val_nrm[0])

    per_scene_segs = [pj.segs for pj in prepared]
    if pad:
        pad_segs = jax.tree.map(
            lambda x: jnp.repeat(x[:1], pad, axis=0), prepared[0].segs
        )
        per_scene_segs.append(pad_segs)
    segs = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *per_scene_segs)
    stacked_tables = hypothesis.stack_object_tables(tables)
    msp = jnp.asarray(np.stack(search_pts))
    msm = jnp.asarray(np.stack(search_mask))
    mvp = jnp.asarray(np.stack(val_pts))
    mvn = jnp.asarray(np.stack(val_nrm))
    # Generation keys: per-scene [K, 2] key-data rows concatenate in job
    # order (host numpy when prepared with fetch_meta=True, lazy device
    # slices otherwise - identical values either way).
    key_parts = [pj.gen_keys for pj in prepared]
    if isinstance(key_parts[0], np.ndarray):
        flat_keys = jnp.asarray(np.concatenate(key_parts, axis=0))
    else:
        flat_keys = jnp.concatenate(key_parts, axis=0)
    if pad:
        flat_keys = jnp.concatenate(
            [flat_keys, jnp.repeat(flat_keys[:1], pad, axis=0)], axis=0
        )
    keys_arr = jax.random.wrap_key_data(flat_keys)

    if mesh is not None:
        def put(x, ndim=None):
            return jax.device_put(x, _job_sharding(mesh, x.ndim if ndim is None else ndim))

        segs = jax.tree.map(put, segs)
        msp, msm, mvp, mvn = put(msp), put(msm), put(mvp), put(mvn)
        keys_arr = put(keys_arr)
        stacked_tables = type(stacked_tables)(
            presence=put(stacked_tables.presence),
            offsets=put(stacked_tables.offsets),
            counts=put(stacked_tables.counts),
            pairs=put(stacked_tables.pairs),
            trans_disc=stacked_tables.trans_disc,
            rot_disc=stacked_tables.rot_disc,
            max_dist_mm=stacked_tables.max_dist_mm,
        )

    res = hypothesis.generate_hypotheses_jobs(
        keys_arr, segs, msp, msm, stacked_tables, mvp, mvn, cfg,
        use_pallas=use_pallas, mode=gen_mode,
    )

    # Selection (LCP mode: best hypothesis is the pose) + top-k + refinement,
    # all batched over the job axis.
    def _topk(scores, transforms):
        vals, idx = jax.lax.top_k(scores, top_k)
        return transforms[idx], vals

    top_tf, top_scores = jax.vmap(_topk)(res.scores, res.transforms)

    pose_cam = res.best_transform  # lcp_select semantics: best-scoring pose
    if do_refine:
        def refine_one(tf, mvp_i, mvn_i, seg_i):
            out = icp_mod.refine_icp(
                tf[None], mvp_i[:1024], mvn_i[:1024], seg_i.pts, seg_i.mask,
                iters=cfg.icp.iters,
                trim_fraction=cfg.icp.trim_fraction,
                max_corr_dist=cfg.icp.max_corr_dist,
                point_to_plane=cfg.icp.point_to_plane,
            )[0]
            return out

        refined = jax.vmap(refine_one)(pose_cam, mvp, mvn, segs)
        # estimate_pose skips refinement for degenerate (score<=0) segments.
        pose_cam = jnp.where((res.best_score > 0)[:, None, None], refined, pose_cam)

    # Pack everything the host consumes into one [J, 17 + 17*top_k] array:
    # one fetch instead of four synchronous ~31 ms axon round trips.
    packed = jnp.concatenate(
        [
            pose_cam[:j].reshape(j, 16),
            res.best_score[:j, None],
            top_tf[:j].reshape(j, top_k * 16),
            top_scores[:j],
        ],
        axis=1,
    )
    return dict(job_names=job_names, prepared=prepared, packed=packed,
                top_k=top_k)


def _finalize_jobs(state: dict) -> Dict[int, List[ObjectPoseEstimate]]:
    """Fetch a dispatched batch's packed results (ONE transfer) and build
    the per-scene estimate lists."""
    prepared = state["prepared"]
    per_scene: Dict[int, List[ObjectPoseEstimate]] = {
        i: [] for i in range(len(prepared))
    }
    if state["packed"] is None:
        return per_scene
    top_k = state["top_k"]
    packed = np.asarray(state["packed"])  # the single synchronous fetch
    pose_cam = packed[:, :16].reshape(-1, 4, 4)
    best_score = packed[:, 16]
    top_tf = packed[:, 17 : 17 + 16 * top_k].reshape(-1, top_k, 4, 4)
    top_scores = packed[:, 17 + 16 * top_k :]
    for row, (si, oi, name) in enumerate(state["job_names"]):
        pj = prepared[si]
        # to_world is a 4x4 matmul; both operands are already host arrays.
        # Doing it in numpy avoids a ~31 ms device round trip PER JOB
        # through the axon tunnel (to_world semantics: cam_pose @ pose_cam).
        pw = np.asarray(pj.sc.cam_pose, np.float32) @ pose_cam[row]
        per_scene[si].append(
            ObjectPoseEstimate(
                name=name,
                pose_cam=pose_cam[row],
                pose_world=pw,
                score=float(best_score[row]),
                hypotheses=top_tf[row],
                hypothesis_scores=top_scores[row],
            )
        )
    return per_scene


def sweep_scenes(
    mesh: Optional[Mesh],
    scene_dirs: Sequence[str],
    db: ObjectDB,
    dataset: str = "APC",
    segmentation_mode: str = "GT",
    hypothesis_mode: str = "PCS",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = 0,
    top_k: int = 25,
    refine_final: bool = True,
    use_pallas: bool | None = None,
    nn_predictor=None,
    detector=None,
    verification_mode: str = "LCP",
    pipeline_chunks: int = 1,
) -> Dict[str, PoseEstimationResult]:
    """Estimate poses for many scenes with jobs sharded over the mesh.

    verification_mode="LCP": the sweep's single device program is generation
    + scoring + refinement. verification_mode="MCTS" additionally runs the
    physics-aware searches of ALL scenes concurrently through one
    MultiSceneLeafEvaluator (pipeline/mcts.py) - pending leaves from every
    scene's tree share each settle+render dispatch, AND that shared batch's
    row axis is sharded over the whole mesh (the search stage uses every
    chip, not one - completing BASELINE config 5 for the MCTS configuration
    end to end). Returns
    {scene_dir: PoseEstimationResult} with the same per-object contents as
    api.estimate_pose(..., verification_mode=...).

    pipeline_chunks > 1 (LCP mode only) splits the scene list into that many
    chunks and overlaps chunk i+1's host preprocessing + uploads with chunk
    i's device program (results are identical - jobs are independent and the
    per-scene PRNG flow is fixed). The axon backend executes transfers and
    kernels concurrently (scripts/r3_sweep_overlap_probe.py), so steady-state
    throughput approaches max(host, device) instead of their sum. MCTS
    sweeps ignore the knob: their searches already share device dispatches
    across ALL scenes, which chunking would serialize.
    """
    gen_modes = {"PCS": "stocs", "CONGRUENT_SET_MATCHING": "stocs",
                 "SUPER4PCS": "super4pcs", "V4PCS": "v4pcs"}
    if hypothesis_mode not in gen_modes:
        raise ValueError(f"unsupported sweep hypothesis mode {hypothesis_mode!r}")
    if verification_mode not in ("LCP", "MCTS"):
        raise ValueError(f"unsupported sweep verification mode {verification_mode!r}")
    is_mcts = verification_mode == "MCTS"
    prep_kwargs = dict(
        dataset=dataset, segmentation_mode=segmentation_mode, cfg=cfg,
        seed=seed, nn_predictor=nn_predictor, detector=detector,
        fetch_depth=is_mcts, fetch_meta=is_mcts,
    )
    dispatch_kwargs = dict(
        db=db, cfg=cfg, gen_mode=gen_modes[hypothesis_mode], top_k=top_k,
        # The pre-search ICP polish is dead work for MCTS: the search
        # consumes est.hypotheses (raw, as the reference feeds UCT -
        # UCTSearch.cpp:56-88) and _install_assignment overwrites
        # pose_cam/pose_world with the settled chosen assignment. Same
        # guard as api.estimate_pose.
        do_refine=refine_final and not is_mcts,
        use_pallas=use_pallas,
    )

    if pipeline_chunks > 1 and not is_mcts and len(scene_dirs) > 1:
        t0 = time.perf_counter()
        idx_chunks = [
            list(b)
            for b in np.array_split(
                np.arange(len(scene_dirs)), min(pipeline_chunks, len(scene_dirs))
            )
            if len(b)
        ]
        out: Dict[str, PoseEstimationResult] = {}
        scene_lists: List[List[tuple]] = []  # (scene_dir, estimates)
        inflight = None
        prep_host_s = 0.0  # measured even though overlapped (see timings)
        for idxs in idx_chunks + [None]:
            state = None
            if idxs is not None:
                tp = time.perf_counter()
                chunk_prepared = prepare_scenes(
                    [scene_dirs[i] for i in idxs], db, **prep_kwargs
                )
                prep_host_s += time.perf_counter() - tp
                state = _dispatch_jobs(mesh, chunk_prepared, **dispatch_kwargs)
            if inflight is not None:
                per_scene = _finalize_jobs(inflight)
                for si, pj in enumerate(inflight["prepared"]):
                    scene_lists.append((pj.scene_dir, per_scene[si]))
            inflight = state
        total = time.perf_counter() - t0
        n_scenes = max(len(scene_lists), 1)
        timings = {
            # Host preprocessing is overlapped with device work by design,
            # so it does not ADD to wall time - but it is still MEASURED
            # and reported (preprocess_host_s): if host prep ever regresses
            # past device time it becomes the pipeline bottleneck, and a
            # silently-zero row would hide that (VERDICT r3 Weak #6).
            "preprocess_s": 0.0,
            "preprocess_host_s": prep_host_s / n_scenes,
            "device_s": total / n_scenes,
            "mcts_s": 0.0,
            "scenes_per_sec": n_scenes / total,
            "pipelined": True,
            "pipeline_chunks": len(idx_chunks),
        }
        for sd, estimates in scene_lists:
            out[sd] = PoseEstimationResult(objects=estimates, timings=dict(timings))
        return out

    t0 = time.perf_counter()
    prepared = prepare_scenes(scene_dirs, db, **prep_kwargs)
    prep_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    state = _dispatch_jobs(mesh, prepared, **dispatch_kwargs)
    if state["packed"] is None:
        return {}
    per_scene = _finalize_jobs(state)
    device_s = time.perf_counter() - t1

    mcts_s = 0.0
    if is_mcts:
        from physimglobalpose_tpu.pipeline import mcts as mcts_mod

        t2 = time.perf_counter()
        scene_rows = [
            (per_scene[si], pj.sc, pj.table_pose, pj.depth_clean)
            for si, pj in enumerate(prepared)
        ]
        refined_rows = mcts_mod.mcts_select_multi(
            scene_rows, db, cfg, seed=seed, mesh=mesh,
            # Stacked per-scene Segment3D: enables the final-pass TrICP
            # refinement (cfg.mcts.tricp_final) in the shared final dispatch.
            segs_list=[pj.segs for pj in prepared],
        )
        for si in per_scene:
            per_scene[si] = refined_rows[si]
        mcts_s = time.perf_counter() - t2

    out = {}
    n_scenes = len(prepared)
    for si, pj in enumerate(prepared):
        out[pj.scene_dir] = PoseEstimationResult(
            objects=per_scene[si],
            timings={
                "preprocess_s": prep_s / n_scenes,
                "device_s": device_s / n_scenes,
                "mcts_s": mcts_s / n_scenes,
                "scenes_per_sec": n_scenes / (prep_s + device_s + mcts_s),
            },
        )
    return out
