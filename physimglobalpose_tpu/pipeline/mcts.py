"""Physics-aware MCTS over object placement orders.

Reference (UCTSearch/UCTState): tree node = partial scene (first k objects
placed, one hypothesis each). Expansion picks the best-unexpanded child by
LCP heuristic, then runs physics settle -> depth render -> pixel cost;
rollouts pick random hypotheses to full depth; backup sums costs; descent
uses a *minimizing* UCB qval/n - alpha sqrt(2 ln N / n) with alpha = 5000
(UCTState.cpp:275-296); budget 60 s or sum_i branching^i expansions
(UCTSearch.cpp:286-307).

TPU design: the tree lives on the host (tiny); every leaf evaluation
(settle + render + cost, the reference's per-node hot path) is batched - the
controller collects up to leaf_batch pending evaluations per iteration using
virtual loss to decorrelate, then one jitted device program evaluates them
all: [B, K] object placements -> batched physics settle -> batched splat
render of every placed object -> composite -> [B] costs. The reference pays
60 serial Bullet steps + a GL round-trip per node; here a whole batch costs
one dispatch.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import time
from typing import Dict, List, Optional

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.geometry import se3
from physimglobalpose_tpu.ops import cost as cost_mod
from physimglobalpose_tpu.ops import physics, raster


@dataclasses.dataclass
class _Node:
    depth: int  # number of objects placed
    choice: int  # hypothesis index chosen for object depth-1 (-1 at root)
    parent: Optional["_Node"]
    children: Dict[int, "_Node"]
    qval: float = 0.0
    n: int = 0
    virtual: int = 0
    hval: float = 0.0  # LCP heuristic of this placement
    # Cached leaf cost for TERMINAL nodes (depth == K): a terminal node's
    # assignment is fully determined, so its settle->render->cost is
    # deterministic - re-descents back up the cached value host-side instead
    # of re-evaluating the same batch row on device. (The reference
    # re-simulates terminals every visit, UCTSearch.cpp:286-307 - identical
    # values, wasted Bullet+GL; late search is dominated by such visits.)
    cached_cost: Optional[float] = None
    # True once this subtree is fully enumerated (terminal: cost cached;
    # internal: all C children exist and are exhausted). A search whose ROOT
    # is exhausted has evaluated every reachable assignment - further rounds
    # would only re-back-up cached values, so it terminates early instead of
    # spinning until the wall-clock deadline.
    exhausted: bool = False

    def ucb(self, alpha: float, parent_n: int) -> float:
        n = self.n + self.virtual
        if n == 0:
            return -math.inf
        return self.qval / n - alpha * math.sqrt(2 * math.log(max(parent_n, 1)) / n)


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "radius"))
def _eval_batch_jit(consts, cfg, h, w, radius, choices, active):
    """Module-level jitted batch evaluator.

    Top-level (not a per-instance jax.jit of a bound method) so the trace
    cache is shared across evaluator instances: a dataset sweep or repeated
    estimate_pose calls with same-shaped scenes retrace nothing - per-scene
    constants are traced ARGUMENTS, not closure constants.
    """
    return jax.vmap(
        lambda c, a: _leaf_eval_one(consts, cfg, h, w, radius, c, a)
    )(choices, active)


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "radius"))
def _eval_batch_multi_jit(consts, cfg, h, w, radius, scene_idx, choices, active):
    """Multi-scene variant: gathers each row's scene constants by index."""

    def row(si, c, a):
        consts_i = jax.tree.map(lambda x: x[si], consts)
        return _leaf_eval_one(consts_i, cfg, h, w, radius, c, a)

    return jax.vmap(row)(scene_idx, choices, active)


def _leaf_eval_one(consts, cfg, h, w, radius, choice_row, active_row):
    """Evaluate ONE placement assignment: settle -> render -> pixel cost.

    consts: per-scene constants dict (hulls, render clouds, world hypotheses,
    camera/table poses, intrinsics, observed depth). Shared by the
    single-scene BatchedLeafEvaluator (vmap over leaves) and the multi-scene
    MultiSceneLeafEvaluator (vmap over (scene, leaf) rows after a per-row
    scene gather).
    """
    k = consts["hull_pts"].shape[0]
    num_hyp = consts["hyp_world"].shape[1]
    safe_choice = jnp.clip(choice_row, 0, num_hyp - 1)
    poses_w = consts["hyp_world"][jnp.arange(k), safe_choice]  # [K, 4, 4]
    return _settle_render_cost(consts, cfg, h, w, radius, poses_w, active_row)


def _settle_render_cost(consts, cfg, h, w, radius, poses_w, active_row):
    """Settle explicit world poses, then render + pixel cost (the leaf body,
    split out so the TrICP final pass can feed refined poses through the
    identical settle/cost path)."""
    ph = cfg.physics
    k = consts["hull_pts"].shape[0]
    order_pos = jnp.cumsum(active_row.astype(jnp.int32)) - 1
    quat = se3.matrix_to_quat(poses_w[:, :3, :3])
    pos = poses_w[:, :3, 3]

    def scene_for(inv_mass, placed_row):
        return physics.PhysicsScene(
            hull_pts=consts["hull_pts"],
            hull_mask=consts["hull_mask"]
            & placed_row[:, None],  # unplaced objects have no hull -> no contacts
            hull_eqs=consts["hull_eqs"],
            inv_mass=inv_mass,
            inv_inertia=consts["inv_inertia"],
            table_pose=consts["table_pose"],
            table_half_extents=jnp.asarray(ph.table_half_extents),
            # Unplaced objects must not collide in either role (their
            # hull_eqs would act as invisible static colliders at the
            # clipped hypothesis-0 pose); reference correctPhysics only
            # adds placed objects to the world (UCTState.cpp:208-270).
            body_active=placed_row,
        )

    def run_settle(scene, q, p, dyn_idx):
        # Exactly one body is dynamic per settle here (reference
        # correctPhysics semantics) - use the specialized solver, whose
        # per-substep chain is 2 contact solves instead of K+1
        # (physics.settle_single_dynamic; equivalence gated by
        # tests/test_physics.py).
        return physics.settle_single_dynamic(
            scene, q, p, dyn_idx,
            steps=ph.steps, substeps=ph.substeps, dt=ph.dt,
            gravity=ph.gravity, damping=ph.damping,
            friction=ph.friction, restitution=ph.restitution,
        )

    def dyn_of(is_dyn):
        return jnp.where(jnp.any(is_dyn), jnp.argmax(is_dyn), -1)

    if cfg.mcts.sequential_settle:
        # Reference defaultPolicy settles each newly placed object on
        # top of the previously *settled* ones (UCTSearch.cpp:140-194):
        # scan over placement order, object at position d dynamic,
        # 0..d-1 static at their settled poses, later objects absent.
        def settle_step(carry, d):
            q, p = carry
            is_dyn = active_row & (order_pos == d)
            placed = active_row & (order_pos <= d)
            inv_mass = jnp.where(is_dyn, 1.0 / ph.object_mass, 0.0)
            q2, p2 = run_settle(scene_for(inv_mass, placed), q, p, dyn_of(is_dyn))
            return (q2, p2), None

        (q2, p2), _ = jax.lax.scan(settle_step, (quat, pos), jnp.arange(k))
    else:
        # Fast path: one settle of the complete assignment, only the
        # last-placed object dynamic (single-dynamic semantics;
        # equivalent for non-stacked scenes - measured A/B in
        # tests/test_mcts_stacked.py).
        last_idx = jnp.max(jnp.where(active_row, order_pos, -1))
        is_dynamic = active_row & (order_pos == last_idx)
        inv_mass = jnp.where(is_dynamic, 1.0 / ph.object_mass, 0.0)
        q2, p2 = run_settle(scene_for(inv_mass, active_row), quat, pos, dyn_of(is_dynamic))
    settled_w = se3.pose_from_rot_trans(se3.quat_to_matrix(q2), p2)
    c = _render_cost_of_poses(consts, cfg, h, w, radius, settled_w, active_row)
    return c, settled_w


def _render_cost_of_poses(consts, cfg, h, w, radius, poses_w, active_row):
    """Pixel cost of explicit world poses (no settle).

    Render all placed objects in camera frame: one scatter pass composites
    every object (associative scatter-min == the reference's per-object
    min-composite, UCTState.cpp:62-68). The max_depth clamp is the
    reference's 1 m render cut (renderScene.cpp:70): objects pushed out of
    the workspace render as empty, so their pixels count as unexplained
    rather than wrongly-explained.
    """
    poses_cam = jnp.einsum("ij,kjl->kil", consts["cam_pose_inv"], poses_w)
    depth = raster.render_scene_depth(
        poses_cam, consts["render_pts"],
        consts["render_mask"] & active_row[:, None],
        consts["intr"], h, w, radius=radius,
        max_depth=cfg.render.max_render_depth,
    )
    return cost_mod.render_cost(
        consts["obs"], depth, cfg.render.explanation_threshold
    )


_TRICP_MODEL_POINTS = 1024  # strided model-cloud budget for the ICP matmuls


def _tricp_refine_cam(poses_c, model_pts, model_nrm, model_mask, seg_pts,
                      seg_mask, active, cfg):
    """Sequential unexplained-segment trimmed ICP, camera frame.

    UCTState::performTrICP (UCTState.cpp:121-204) semantics: for each placed
    object in placement order, drop segment points within
    tricp_removal_radius of ANY already-placed object's transformed model
    cloud (the kd-tree radius filter, UCTState.cpp:158-175), then refine the
    object's pose by trimmed point-to-point ICP against the remaining
    segment (PCL TrimmedICP: keep the best tricp_trim fraction of segment
    correspondences). TPU shape: the radius filter is one [N, i*M] distance
    matmul; the ICP is ops/icp._icp_single with exact trimming. Objects are
    skipped (pose passed through) when inactive, when the unexplained
    segment is degenerate (<10 points), or when the solve goes non-finite.
    """
    from physimglobalpose_tpu.ops import icp as icp_mod

    mc = cfg.mcts
    k = poses_c.shape[0]
    far = 1e4  # masked points live 10 km away: never matched, no overflow
    placed: list = []  # transformed model clouds of already-placed objects
    out = []
    for i in range(k):
        seg_m = seg_mask[i]
        if placed:
            allp = jnp.concatenate(placed, axis=0)  # [i*M, 3]
            d2 = (
                jnp.sum(seg_pts[i] * seg_pts[i], axis=-1)[:, None]
                + jnp.sum(allp * allp, axis=-1)[None, :]
                - 2.0 * seg_pts[i] @ allp.T
            )
            seg_m = seg_m & (
                jnp.min(d2, axis=-1) > mc.tricp_removal_radius ** 2
            )
        mp = jnp.where(model_mask[i][:, None], model_pts[i], far)
        tf = icp_mod._icp_single(
            poses_c[i], mp, model_nrm[i], seg_pts[i], seg_m,
            iters=mc.tricp_iters,
            trim_fraction=mc.tricp_trim,
            max_corr_dist=mc.tricp_max_corr_dist,
            point_to_plane=False,  # PCL TrimmedICP is point-to-point
            exact_trim=True,       # the trim IS the outlier model here
        )
        ok = active[i] & jnp.all(jnp.isfinite(tf)) & (jnp.sum(seg_m) >= 10)
        tf = jnp.where(ok, tf, poses_c[i])
        out.append(tf)
        placed.append(
            jnp.where(
                model_mask[i][:, None] & active[i],
                model_pts[i] @ tf[:3, :3].T + tf[:3, 3], far,
            )
        )
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "radius"))
def _poses_cost_jit(consts, cfg, h, w, radius, poses_w, active):
    """Render costs of B explicit pose sets (no settle): [B, K, 4, 4] -> [B]."""
    return jax.vmap(
        lambda p: _render_cost_of_poses(consts, cfg, h, w, radius, p, active)
    )(poses_w)


def _perturb_poses(rng, poses_w, sig_t, sig_r, batch, only_obj=None):
    """[K,4,4] -> [B,K,4,4]: row 0 = unperturbed; rows 1.. rotate about each
    object's own origin and translate in world (host numpy Rodrigues).
    only_obj: perturb just that object index (others stay fixed)."""
    k = poses_w.shape[0]
    out = np.tile(poses_w[None], (batch, 1, 1, 1)).astype(np.float64)
    w_axis = rng.normal(0.0, sig_r, (batch - 1, k, 3))
    dt = rng.normal(0.0, sig_t, (batch - 1, k, 3))
    if only_obj is not None:
        keep = np.zeros((1, k, 1))
        keep[0, only_obj, 0] = 1.0
        w_axis = w_axis * keep
        dt = dt * keep
    theta = np.linalg.norm(w_axis, axis=-1, keepdims=True)
    ax = w_axis / np.maximum(theta, 1e-12)
    ct = np.cos(theta)[..., None]
    st = np.sin(theta)[..., None]
    x, y, z = ax[..., 0], ax[..., 1], ax[..., 2]
    zeros = np.zeros_like(x)
    kx = np.stack([
        np.stack([zeros, -z, y], -1),
        np.stack([z, zeros, -x], -1),
        np.stack([-y, x, zeros], -1),
    ], -2)  # [B-1, K, 3, 3]
    eye = np.eye(3)[None, None]
    dr = eye + st * kx + (1.0 - ct) * (kx @ kx)
    out[1:, :, :3, :3] = out[1:, :, :3, :3] @ dr
    out[1:, :, :3, 3] += dt
    return out


def _final_polish(evaluator, poses_w, active, cfg, seed=0):
    """Stochastic descent on the render cost around the final state.

    Each round: batched no-settle cost dispatches over perturbations of the
    CURRENT best (row 0 keeps it, so the result is monotone in cost); sigma
    halves per round. final_polish_per_object perturbs one object per
    dispatch (sample efficiency for single-object misses - the measured
    cost-visible margins are 7-22 px for ONE object's 2 cm). The evaluator
    should be built at cfg.mcts.final_polish_scale (full resolution: the
    scale-4 search cost quantizes those margins away). Returns
    (poses [K,4,4], cost)."""
    mc = cfg.mcts
    rng = np.random.default_rng(seed)
    best = np.asarray(poses_w, np.float64)
    best_cost = np.inf
    k = best.shape[0]
    active = np.asarray(active)
    obj_rounds = (
        [i for i in range(k) if active[i]]
        if mc.final_polish_per_object else [None]
    )
    sig_t, sig_r = mc.final_polish_sigma_t, math.radians(mc.final_polish_sigma_r_deg)
    for _ in range(mc.final_polish_rounds):
        for oi in obj_rounds:
            batch = _perturb_poses(
                rng, best, sig_t, sig_r, mc.final_polish_batch, only_obj=oi
            )
            costs = np.asarray(
                _poses_cost_jit(
                    evaluator.consts_full, evaluator.cfg, evaluator.h,
                    evaluator.w, evaluator.splat_radius,
                    jnp.asarray(batch.astype(np.float32)), jnp.asarray(active),
                )
            )
            i = int(np.argmin(costs))
            if costs[i] <= best_cost:
                best, best_cost = batch[i], float(costs[i])
        sig_t *= 0.5
        sig_r *= 0.5
    return best.astype(np.float32), best_cost


_TRICP_ORDER = (1, 2, 0)  # tie preference: tricp->settle, settle->tricp, raw


def _tricp_pick(costs3) -> int:
    """Select the installed final state: min render cost, ties broken FOR the
    refined candidates (_TRICP_ORDER).

    Heavily occluded objects contribute only a handful of pixels at the
    search render scale, so the three candidates often TIE on the integer
    pixel cost - and a raw-first argmin would discard a refinement the cost
    simply cannot see (measured on the hard family: the 3 MCTS misses all
    tie). The reference applies TrICP unconditionally (Search.cpp:45); the
    cost vote here exists only to veto REGRESSIONS, so ties go to TrICP.
    """
    costs3 = np.asarray(costs3)
    return int(min(_TRICP_ORDER, key=lambda i: (costs3[i], _TRICP_ORDER.index(i))))


def _tricp_final_core(consts, cam_pose, model_nrm, seg_pts, seg_mask,
                      cfg, h, w, radius, choices, active):
    """Final-state evaluation with TrICP refinement, ONE scene.

    Three candidate final states through the identical settle/cost path:
      0: raw chosen hypotheses -> settle           (the pre-r5 behavior)
      1: TrICP -> settle   (reference expandNode order, Search.cpp:43-47)
      2: settle -> TrICP polish (cost re-rendered; data-pull after physics)
    Returns (costs [3], settled [3, K, 4, 4]); the caller installs the
    argmin row - the refinement can only improve the render cost.
    """
    k, num_hyp = consts["hyp_world"].shape[:2]
    safe_choice = jnp.clip(choices, 0, num_hyp - 1)
    poses_w = consts["hyp_world"][jnp.arange(k), safe_choice]
    stride = max(1, consts["render_pts"].shape[1] // _TRICP_MODEL_POINTS)
    mp = consts["render_pts"][:, ::stride]
    mm = consts["render_mask"][:, ::stride]
    mn = model_nrm[:, ::stride]
    cam_inv = consts["cam_pose_inv"]

    poses_c = jnp.einsum("ij,kjl->kil", cam_inv, poses_w)
    refined_c = _tricp_refine_cam(
        poses_c, mp, mn, mm, seg_pts, seg_mask, active, cfg
    )
    refined_w = jnp.einsum("ij,kjl->kil", cam_pose, refined_c)

    c0, s0 = _settle_render_cost(consts, cfg, h, w, radius, poses_w, active)
    c1, s1 = _settle_render_cost(consts, cfg, h, w, radius, refined_w, active)
    s0_c = jnp.einsum("ij,kjl->kil", cam_inv, s0)
    polish_c = _tricp_refine_cam(
        s0_c, mp, mn, mm, seg_pts, seg_mask, active, cfg
    )
    s2 = jnp.einsum("ij,kjl->kil", cam_pose, polish_c)
    c2 = _render_cost_of_poses(consts, cfg, h, w, radius, s2, active)
    return jnp.stack([c0, c1, c2]), jnp.stack([s0, s1, s2])


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "radius"))
def _tricp_final_jit(consts, cam_pose, model_nrm, seg_pts, seg_mask,
                     cfg, h, w, radius, choices, active):
    return _tricp_final_core(
        consts, cam_pose, model_nrm, seg_pts, seg_mask,
        cfg, h, w, radius, choices, active,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "radius"))
def _tricp_final_multi_jit(consts, cam_pose, model_nrm, seg_pts, seg_mask,
                           cfg, h, w, radius, choices, active):
    """Multi-scene variant: one row per scene, all scenes in one dispatch."""

    def one(consts_i, cam_i, mn_i, sp_i, sm_i, ch_i, ac_i):
        return _tricp_final_core(
            consts_i, cam_i, mn_i, sp_i, sm_i, cfg, h, w, radius, ch_i, ac_i
        )

    return jax.vmap(one)(
        consts, cam_pose, model_nrm, seg_pts, seg_mask, choices, active
    )


def _decimate_contact_hull(h: dict, max_vertices: int) -> dict:
    """Search-time contact hull: farthest-point-sampled vertex subset with
    recomputed faces (an inscribed approximation; cfg.mcts.contact_hull_vertices).

    Contact math per settle substep scales with vertices x faces
    (ops/physics.py table/body contacts), so the full asset hulls
    (64 verts / 96 faces) dominate the leaf cost on real scenes.
    """
    from physimglobalpose_tpu.models import assets

    pts = np.asarray(h["hull_pts"])[np.asarray(h["hull_mask"])]
    if len(pts) <= max_vertices:
        return h
    dec = assets.convex_hull_points(pts, max_vertices)
    eqs = assets.convex_hull_planes(dec, max_faces=2 * max_vertices)
    # The FPS subset's hull is inscribed in the true hull; resting an
    # inscribed cylinder bottom on the table biased rest poses low enough to
    # trip the 2 cm ADD-S gate (measured round 3). Shift every face plane
    # outward by its maximum overhang over the ORIGINAL vertices so the
    # decimated hull circumscribes the object (the same role as Bullet's
    # convex collision margin) - face-contact rest heights then match the
    # full hull.
    overhang = np.maximum(
        (pts @ eqs[:, :3].T + eqs[:, 3][None, :]).max(axis=0), 0.0
    )
    eqs = eqs.copy()
    eqs[:, 3] -= overhang
    out = dict(h)
    out["hull_pts"] = dec
    out["hull_mask"] = np.ones(len(dec), bool)
    out["hull_eqs"] = eqs.astype(np.float32)
    return out


class BatchedLeafEvaluator:
    """Evaluates B candidate placements (settle + render + cost) on device."""

    def __init__(
        self,
        obj_hulls: List[dict],  # per object: hull_pts/hull_mask/hull_eqs/render_pts/render_mask
        hypotheses_world: np.ndarray,  # [K, C, 4, 4] world-frame hypothesis poses
        obs_depth: np.ndarray,  # [H, W]
        intrinsics: np.ndarray,
        cam_pose: np.ndarray,
        table_pose: np.ndarray,
        cfg: PipelineConfig,
        render_scale: int | None = None,
    ):
        if render_scale is None:
            render_scale = cfg.mcts.render_scale
        self.cfg = cfg
        k = len(obj_hulls)
        self.k = k
        self.num_hyp = hypotheses_world.shape[1]
        ph = cfg.physics

        def pack_hulls(hull_list):
            p_max = max(h["hull_pts"].shape[0] for h in hull_list)
            f_max = max(h["hull_eqs"].shape[0] for h in hull_list)
            hull_pts = np.zeros((k, p_max, 3), np.float32)
            hull_mask = np.zeros((k, p_max), bool)
            hull_eqs = np.tile(np.array([0, 0, 1, -1e9], np.float32), (k, f_max, 1))
            inv_inertia = np.zeros((k, 3), np.float32)
            for i, h in enumerate(hull_list):
                hp = h["hull_pts"]
                hull_pts[i, : len(hp)] = hp
                hull_mask[i, : len(hp)] = h["hull_mask"][: len(hp)]
                he = h["hull_eqs"]
                hull_eqs[i, : len(he)] = he
                # Host-side numpy (NOT physics.box_inv_inertia): each jax
                # call here is a synchronous ~31 ms device round trip on the
                # axon backend, paid per object per evaluator construction.
                valid = hull_pts[i][hull_mask[i]]
                ext = np.maximum(valid.max(0) - valid.min(0), 1e-3)
                m = ph.object_mass / 12.0
                inv_inertia[i] = 1.0 / np.array(
                    [m * (ext[1] ** 2 + ext[2] ** 2),
                     m * (ext[0] ** 2 + ext[2] ** 2),
                     m * (ext[0] ** 2 + ext[1] ** 2)], np.float32,
                )
            return dict(
                hull_pts=jnp.asarray(hull_pts),
                hull_mask=jnp.asarray(hull_mask),
                hull_eqs=jnp.asarray(hull_eqs),
                inv_inertia=jnp.asarray(inv_inertia),
            )

        # Search-time hulls: decimated (cfg.mcts.contact_hull_vertices) -
        # contact math dominates the leaf cost on real scenes. The FULL
        # hulls are kept alongside: evaluate_final() settles the chosen
        # assignment with them, so the REPORTED poses never carry the
        # decimation approximation (only the search ranking does).
        cv = cfg.mcts.contact_hull_vertices
        search_hulls = (
            [_decimate_contact_hull(h, cv) for h in obj_hulls] if cv > 0
            else obj_hulls
        )
        self.scene_const = pack_hulls(search_hulls)
        self.scene_const_full = (
            pack_hulls(obj_hulls) if search_hulls is not obj_hulls else None
        )

        n_max = max(h["render_pts"].shape[0] for h in obj_hulls)
        render_pts = np.zeros((k, n_max, 3), np.float32)
        render_nrm = np.zeros((k, n_max, 3), np.float32)
        render_mask = np.zeros((k, n_max), bool)
        for i, h in enumerate(obj_hulls):
            rp = h["render_pts"]
            render_pts[i, : len(rp)] = rp
            render_mask[i, : len(rp)] = h["render_mask"][: len(rp)]
            rn = h.get("render_nrm")
            if rn is not None:
                render_nrm[i, : len(rn)] = rn
        self.render_pts = jnp.asarray(render_pts)
        self.render_nrm = jnp.asarray(render_nrm)
        self.render_mask = jnp.asarray(render_mask)
        self.hyp_world = jnp.asarray(hypotheses_world)
        self.table_pose = jnp.asarray(table_pose)
        self.cam_pose = jnp.asarray(cam_pose)
        # Host numpy rigid inverse (a jax invert_pose + fetch here costs a
        # ~31 ms axon round trip per evaluator construction).
        cp = np.asarray(cam_pose, np.float64)
        cp_inv = np.eye(4)
        cp_inv[:3, :3] = cp[:3, :3].T
        cp_inv[:3, 3] = -cp[:3, :3].T @ cp[:3, 3]
        self.cam_pose_inv = jnp.asarray(cp_inv.astype(np.float32))
        s = render_scale
        self.h = cfg.render.height // s
        self.w = cfg.render.width // s
        self.splat_radius = (
            cfg.mcts.leaf_splat_radius
            if cfg.mcts.leaf_splat_radius >= 0
            else (1 if s == 1 else 0)
        )
        intr = intrinsics.copy().astype(np.float32)
        intr[:2] /= s
        self.intr = jnp.asarray(intr)
        obs = obs_depth[:: s, :: s][: self.h, : self.w]
        self.obs = jnp.asarray(obs.astype(np.float32))

        shared = dict(
            render_pts=self.render_pts,
            render_mask=self.render_mask,
            hyp_world=self.hyp_world,
            table_pose=self.table_pose,
            cam_pose_inv=self.cam_pose_inv,
            intr=self.intr,
            obs=self.obs,
        )
        self.consts = dict(**self.scene_const, **shared)
        self.consts_full = (
            dict(**self.scene_const_full, **shared)
            if self.scene_const_full is not None
            else self.consts
        )

    def evaluate_async(self, batch_choices: np.ndarray, batch_active: np.ndarray):
        """Dispatch without fetching: returns device (costs, settled).

        JAX dispatch is asynchronous - the search controller overlaps host
        tree policy for the NEXT batch with the device executing this one
        (uct_search double-buffering; virtual loss keeps the two batches
        decorrelated)."""
        return _eval_batch_jit(
            self.consts, self.cfg, self.h, self.w, self.splat_radius,
            jnp.asarray(batch_choices), jnp.asarray(batch_active),
        )

    def evaluate(self, batch_choices: np.ndarray, batch_active: np.ndarray):
        """choices: [B, K] hypothesis index per object (-1 = not placed);
        active: [B, K] bool. Returns (costs [B], settled world poses [B, K, 4, 4])."""
        costs, settled = self.evaluate_async(batch_choices, batch_active)
        return np.asarray(costs), np.asarray(settled)

    def evaluate_final(self, batch_choices: np.ndarray, batch_active: np.ndarray):
        """Chosen-assignment settle with the FULL (undecimated) hulls: the
        poses the pipeline reports carry no search-time hull approximation."""
        costs, settled = _eval_batch_jit(
            self.consts_full, self.cfg, self.h, self.w, self.splat_radius,
            jnp.asarray(batch_choices), jnp.asarray(batch_active),
        )
        return np.asarray(costs), np.asarray(settled)

    def evaluate_final_tricp(self, choices: np.ndarray, active: np.ndarray,
                             seg_pts, seg_mask):
        """Final settle + TrICP refinement in ONE dispatch (FULL hulls).

        choices/active: [K]; seg_pts [K, N, 3] / seg_mask [K, N] are the
        per-object camera-frame 3D segments (segmentation.Segment3D fields).
        Returns (costs [3], settled [3, K, 4, 4]) - rows raw / tricp->settle
        / settle->tricp; the caller installs the argmin (see
        _tricp_final_core).
        """
        costs, settled = _tricp_final_jit(
            self.consts_full, self.cam_pose, self.render_nrm,
            jnp.asarray(seg_pts), jnp.asarray(seg_mask),
            self.cfg, self.h, self.w, self.splat_radius,
            jnp.asarray(choices), jnp.asarray(active),
        )
        return np.asarray(costs), np.asarray(settled)


@dataclasses.dataclass
class _Tree:
    """Host-side UCT search state for one scene."""

    root: _Node
    k: int
    c: int
    hyp_scores: np.ndarray  # [K, C]
    rng: np.random.Generator
    budget: int
    expansions: int = 0
    best_cost: float = math.inf
    best_assign: np.ndarray = None  # [K]

    @property
    def done(self) -> bool:
        return self.expansions >= self.budget


def _make_tree(hyp_scores, k, c, budget, seed) -> _Tree:
    best_assign = np.argmax(hyp_scores[:, :c], axis=1).astype(np.int64)
    return _Tree(
        root=_Node(depth=0, choice=-1, parent=None, children={}),
        k=k, c=c, hyp_scores=hyp_scores,
        rng=np.random.default_rng(seed), budget=budget,
        best_assign=best_assign,
    )


def _assignment_of(tree: _Tree, node: _Node, rollout_tail: bool) -> np.ndarray:
    """Choices along the path to node, random tail to full depth."""
    choices = np.full(tree.k, -1, np.int64)
    cur = node
    while cur.parent is not None:
        choices[cur.depth - 1] = cur.choice
        cur = cur.parent
    if rollout_tail:
        for d in range(node.depth, tree.k):
            choices[d] = tree.rng.integers(0, tree.c)
    return choices


def _collect_batch(tree: _Tree, alpha: float, quota: int) -> List[tuple]:
    """Collect up to `quota` pending leaf evaluations with virtual loss.

    Tree policy: descend fully-expanded nodes by min-UCB; expand the best
    unexpanded child by hval (LCP heuristic), as the reference does
    (UCTSearch.cpp:204-211); rollouts pick random hypotheses to full depth.
    """
    pend: List[tuple] = []  # (node_to_backup, choices)
    for _ in range(quota):
        node = tree.root
        while node.depth < tree.k and len(node.children) == tree.c:
            parent_n = node.n + node.virtual
            node = min(
                node.children.values(), key=lambda ch: ch.ucb(alpha, parent_n)
            )
        if node.depth == tree.k and node.cached_cost is not None:
            # Deterministic terminal re-visit: back up the cached cost
            # immediately, no device eval. (_backup pairs with a virtual-loss
            # increment along the path, so add one first - net zero.)
            cur = node
            while cur is not None:
                cur.virtual += 1
                cur = cur.parent
            _backup(tree, [(node, _assignment_of(tree, node, False))],
                    [node.cached_cost])
            continue
        if node.depth < tree.k:
            unexpanded = [i for i in range(tree.c) if i not in node.children]
            pick = max(unexpanded, key=lambda i: tree.hyp_scores[node.depth, i])
            child = _Node(
                depth=node.depth + 1,
                choice=pick,
                parent=node,
                children={},
                hval=float(tree.hyp_scores[node.depth, pick]),
            )
            node.children[pick] = child
            node = child
            tree.expansions += 1
        cur = node
        while cur is not None:
            cur.virtual += 1
            cur = cur.parent
        pend.append((node, _assignment_of(tree, node, rollout_tail=True)))
        if tree.done:
            break
    return pend


def _mark_exhausted(tree: _Tree, node: _Node) -> None:
    """Propagate subtree exhaustion from a newly-cached terminal upward."""
    node.exhausted = True
    cur = node.parent
    while (
        cur is not None
        and len(cur.children) == tree.c
        and all(ch.exhausted for ch in cur.children.values())
    ):
        cur.exhausted = True
        cur = cur.parent


def _backup(tree: _Tree, pend: List[tuple], costs) -> None:
    for (node, choices), cost_v in zip(pend, costs):
        cost_v = float(cost_v)
        if node.depth == tree.k and node.cached_cost is None:
            node.cached_cost = cost_v
            _mark_exhausted(tree, node)
        if cost_v < tree.best_cost:
            tree.best_cost = cost_v
            tree.best_assign = choices.copy()
        cur = node
        while cur is not None:
            cur.virtual -= 1
            cur.n += 1
            cur.qval += cost_v
            cur = cur.parent


def _search_budget(k: int, c: int, cap: int) -> int:
    # Budget: sum_{i=0}^{k} branching^i expansions (UCTSearch.cpp:290-294;
    # the reference loop is `for ii=0; ii<=numObjects` so the i=0 term
    # counts), capped by cfg.mcts.max_expansions - a documented deviation:
    # 25^3+ expansions are intractable serially and unnecessary with batched
    # leaf evaluation, and the reference's own 60 s wall-clock cut typically
    # binds first anyway.
    return min(sum(c**i for i in range(0, k + 1)), cap)


def uct_search(
    evaluator: BatchedLeafEvaluator,
    hyp_scores: np.ndarray,  # [K, C] LCP heuristic per hypothesis
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = 0,
    max_iterations: Optional[int] = None,
) -> tuple[np.ndarray, float]:
    """Run the batched UCT search.

    Returns (best complete assignment [K] hypothesis indices, best cost).
    """
    mc = cfg.mcts
    k = evaluator.k
    c = min(mc.branching, hyp_scores.shape[1])
    budget = _search_budget(k, c, max_iterations or mc.max_expansions)
    tree = _make_tree(hyp_scores, k, c, budget, seed)
    deadline = time.monotonic() + mc.max_search_seconds

    # Pipelined loop: collect the next batch (host tree policy, virtual
    # loss decorrelates it from the un-backed-up ones) while the device
    # executes earlier batches; fetch+backup the OLDEST batch only once
    # cfg.mcts.inflight_batches are dispatched. Depth 1 is classic double
    # buffering; depth 2 additionally hides the axon tunnel's fetch
    # latency (measured ~15 ms/round over the device compute,
    # scripts/r3_mcts_phase_probe.py) behind the next program.
    depth = max(1, mc.inflight_batches)
    inflight: List[tuple] = []  # (pend, device costs), oldest first
    while time.monotonic() < deadline:
        finished = tree.done or tree.root.exhausted
        pend = [] if finished else _collect_batch(tree, mc.alpha, mc.leaf_batch)
        if pend:
            # Pad to the fixed leaf_batch (repeating row 0, results
            # discarded): cached-terminal backups make pend length
            # variable, and each distinct batch shape would be a fresh
            # jit compile.
            rows = [p[1] for p in pend]
            rows += [rows[0]] * (mc.leaf_batch - len(rows))
            batch_choices = np.stack(rows)
            costs_dev, _settled = evaluator.evaluate_async(
                batch_choices, batch_choices >= 0
            )
            inflight.append((pend, costs_dev))
        if len(inflight) > depth or (not pend and inflight):
            prev_pend, prev_costs = inflight.pop(0)
            _backup(tree, prev_pend, np.asarray(prev_costs))
        if not pend and not inflight:
            if finished:
                break
            # Transient cached-terminal-only round: every descent this round
            # backed up a cached cost host-side (shifting the UCB stats)
            # without producing device work. Budget remains and the tree is
            # not exhausted, so keep searching - breaking here would forfeit
            # the remaining expansions.
            continue

    # Deadline exit can leave dispatched batches un-backed-up; their device
    # work is already done, and the best assignment may be in them.
    for prev_pend, prev_costs in inflight:
        _backup(tree, prev_pend, np.asarray(prev_costs))

    return tree.best_assign, tree.best_cost


class MultiSceneLeafEvaluator:
    """Evaluates (scene, leaf) rows from MANY scenes in one device dispatch.

    The reference runs one serial UCT search per scene; the batched
    single-scene evaluator already amortizes settle+render over leaves, and
    this evaluator additionally stacks SCENES into the same batch axis - the
    per-dispatch tunnel latency (the dominant MCTS cost on the axon backend)
    is then paid once for all scenes' pending leaves. Scene constants are
    padded to common (K, P, F, N, C) shapes and stacked on a leading axis;
    evaluate() gathers each row's scene constants by index inside the vmap.

    All scenes must share the image resolution and cfg (true for a dataset
    sweep).

    mesh: optional jax.sharding.Mesh. When given, the (scene, leaf) row axis
    is sharded over ALL mesh devices (the leaf axis is independent by
    construction - each row settles/renders its own scene copy), and the
    stacked scene constants are replicated; on a v5e-8 this puts the MCTS
    *search stage* of a sweep on every chip instead of one (VERDICT r3 #3 -
    the reference has no distributed story, SURVEY.md section 2.7; this is
    the framework's own parallelism obligation). Rows are padded per call to
    a multiple of the device count (repeating row 0; callers only consume
    the real prefix), so any batch size stays legal.
    """

    def __init__(self, evaluators: List[BatchedLeafEvaluator], mesh=None):
        assert evaluators, "need at least one scene"
        self.mesh = mesh
        self.n_shards = int(mesh.devices.size) if mesh is not None else 1
        self.cfg = evaluators[0].cfg
        self.h = evaluators[0].h
        self.w = evaluators[0].w
        for ev in evaluators:
            assert (ev.h, ev.w) == (self.h, self.w), "mixed render resolutions"
        self.ks = [ev.k for ev in evaluators]
        self.k_max = max(self.ks)
        self.num_scenes = len(evaluators)
        self.splat_radius = evaluators[0].splat_radius
        assert all(ev.splat_radius == self.splat_radius for ev in evaluators)

        k_max = self.k_max
        n_max = max(ev.render_pts.shape[1] for ev in evaluators)
        c_max = max(ev.hyp_world.shape[1] for ev in evaluators)

        def pad_to(x, shape):
            x = np.asarray(x)
            out = np.zeros(shape, x.dtype)
            sl = tuple(slice(0, s) for s in x.shape)
            out[sl] = x
            return out

        def stack_consts(scene_consts):
            """Stack per-scene constants with one hull set (search or full)."""
            p_max = max(sc_["hull_pts"].shape[1] for sc_ in scene_consts)
            f_max = max(sc_["hull_eqs"].shape[1] for sc_ in scene_consts)
            consts = dict(
                hull_pts=[], hull_mask=[], hull_eqs=[], inv_inertia=[],
                render_pts=[], render_mask=[], hyp_world=[], table_pose=[],
                cam_pose_inv=[], intr=[], obs=[],
            )
            for ev, sc_ in zip(evaluators, scene_consts):
                k, p = sc_["hull_pts"].shape[:2]
                f = sc_["hull_eqs"].shape[1]
                n = ev.render_pts.shape[1]
                c = ev.hyp_world.shape[1]
                consts["hull_pts"].append(
                    pad_to(sc_["hull_pts"], (k_max, p_max, 3)))
                consts["hull_mask"].append(
                    pad_to(sc_["hull_mask"], (k_max, p_max)))
                # Padded hull faces/objects use the far-away plane so they
                # never produce contacts (same convention as
                # BatchedLeafEvaluator).
                eqs = np.tile(np.array([0, 0, 1, -1e9], np.float32),
                              (k_max, f_max, 1))
                eqs[:k, :f] = np.asarray(sc_["hull_eqs"])
                consts["hull_eqs"].append(eqs)
                inv_in = pad_to(sc_["inv_inertia"], (k_max, 3))
                inv_in[k:] = 1.0  # benign inertia for padded objects
                consts["inv_inertia"].append(inv_in)
                consts["render_pts"].append(pad_to(ev.render_pts, (k_max, n_max, 3)))
                consts["render_mask"].append(pad_to(ev.render_mask, (k_max, n_max)))
                # Padded hypothesis slots repeat hypothesis 0; padded objects
                # get identity poses (never active).
                hw = np.tile(np.eye(4, dtype=np.float32), (k_max, c_max, 1, 1))
                hw[:k, :c] = np.asarray(ev.hyp_world)
                if c < c_max:
                    hw[:k, c:] = hw[:k, :1]
                consts["hyp_world"].append(hw)
                consts["table_pose"].append(np.asarray(ev.table_pose))
                consts["cam_pose_inv"].append(np.asarray(ev.cam_pose_inv))
                consts["intr"].append(np.asarray(ev.intr))
                consts["obs"].append(np.asarray(ev.obs))
            return {kk: jnp.asarray(np.stack(v)) for kk, v in consts.items()}

        self.consts = stack_consts([ev.scene_const for ev in evaluators])
        if any(ev.scene_const_full is not None for ev in evaluators):
            self.consts_full = stack_consts(
                [ev.scene_const_full or ev.scene_const for ev in evaluators]
            )
        else:
            self.consts_full = self.consts
        # Final-pass TrICP inputs (outside `consts` so the per-leaf batch
        # programs don't transfer them every dispatch): stacked camera poses
        # and model normals aligned with consts["render_pts"].
        self.cam_pose_stacked = jnp.asarray(
            np.stack([np.asarray(ev.cam_pose) for ev in evaluators])
        )
        self.render_nrm_stacked = jnp.asarray(
            np.stack([
                pad_to(ev.render_nrm, (k_max, n_max, 3)) for ev in evaluators
            ])
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._row_shard = NamedSharding(mesh, P(("data", "model")))
            shared_full = self.consts_full is self.consts
            self.consts = jax.device_put(self.consts, rep)
            self.consts_full = (
                self.consts if shared_full
                else jax.device_put(self.consts_full, rep)
            )

    def _shard_rows(self, scene_idx, choices, active):
        """Pad the row axis to a multiple of the mesh size and shard it.

        Padding repeats row 0 (a real row - its result is computed twice and
        the copy ignored); callers index only the real prefix."""
        scene_idx = np.asarray(scene_idx)
        choices = np.asarray(choices)
        active = np.asarray(active)
        pad = (-len(scene_idx)) % self.n_shards
        if pad:
            scene_idx = np.concatenate([scene_idx, np.repeat(scene_idx[:1], pad, 0)])
            choices = np.concatenate([choices, np.repeat(choices[:1], pad, 0)])
            active = np.concatenate([active, np.repeat(active[:1], pad, 0)])
        put = lambda x: jax.device_put(jnp.asarray(x), self._row_shard)
        return put(scene_idx), put(choices), put(active)

    def evaluate_async(self, scene_idx: np.ndarray, choices: np.ndarray,
                       active: np.ndarray):
        """Dispatch without fetching (see BatchedLeafEvaluator.evaluate_async).

        With a mesh, the returned arrays may carry row-padding to a multiple
        of the device count; consume only the first len(scene_idx) rows."""
        if self.mesh is not None:
            scene_idx, choices, active = self._shard_rows(
                scene_idx, choices, active
            )
        return _eval_batch_multi_jit(
            self.consts, self.cfg, self.h, self.w, self.splat_radius,
            jnp.asarray(scene_idx), jnp.asarray(choices), jnp.asarray(active),
        )

    def evaluate(self, scene_idx: np.ndarray, choices: np.ndarray,
                 active: np.ndarray):
        costs, settled = self.evaluate_async(scene_idx, choices, active)
        return np.asarray(costs), np.asarray(settled)

    def evaluate_final(self, scene_idx: np.ndarray, choices: np.ndarray,
                       active: np.ndarray):
        """Chosen-assignment settles with the FULL hulls (see
        BatchedLeafEvaluator.evaluate_final)."""
        n_real = len(scene_idx)
        if self.mesh is not None:
            scene_idx, choices, active = self._shard_rows(
                scene_idx, choices, active
            )
        costs, settled = _eval_batch_multi_jit(
            self.consts_full, self.cfg, self.h, self.w, self.splat_radius,
            jnp.asarray(scene_idx), jnp.asarray(choices), jnp.asarray(active),
        )
        return np.asarray(costs)[:n_real], np.asarray(settled)[:n_real]

    def evaluate_final_tricp(self, choices: np.ndarray, active: np.ndarray,
                             seg_pts, seg_mask):
        """Final settles + TrICP refinement of ALL scenes in one dispatch.

        choices/active: [S, k_max]; seg_pts [S, k_max, N, 3] /
        seg_mask [S, k_max, N] padded per scene. Returns
        (costs [S, 3], settled [S, 3, k_max, 4, 4]) - see _tricp_final_core
        for the three candidate rows.
        """
        costs, settled = _tricp_final_multi_jit(
            self.consts_full, self.cam_pose_stacked, self.render_nrm_stacked,
            jnp.asarray(seg_pts), jnp.asarray(seg_mask),
            self.cfg, self.h, self.w, self.splat_radius,
            jnp.asarray(choices), jnp.asarray(active),
        )
        return np.asarray(costs), np.asarray(settled)


def uct_search_multi(
    msev: MultiSceneLeafEvaluator,
    hyp_scores_list: List[np.ndarray],  # per scene [K_s, C_s]
    cfg: PipelineConfig = DEFAULT_CONFIG,
    seed: int = 0,
    max_iterations: Optional[int] = None,
) -> List[tuple[np.ndarray, float]]:
    """Run S concurrent UCT searches sharing one leaf-eval dispatch.

    Each iteration splits cfg.mcts.leaf_batch across the still-running
    scenes, collects their pending leaves (virtual loss decorrelates within
    each tree), evaluates all of them in ONE device call, and backs up
    per-tree. The batch is padded to a fixed size (repeating the first row,
    results discarded) so the jitted evaluator compiles once.

    Returns per scene (best assignment [K_s], best cost).
    """
    mc = cfg.mcts
    trees: List[_Tree] = []
    for si, hs in enumerate(hyp_scores_list):
        k = msev.ks[si]
        c = min(mc.branching, hs.shape[1])
        budget = _search_budget(k, c, max_iterations or mc.max_expansions)
        trees.append(_make_tree(hs, k, c, budget, seed + si))
    deadline = time.monotonic() + mc.max_search_seconds
    k_max = msev.k_max
    # Multi-scene batches are wider than single-scene ones (leaf_batch_multi,
    # measured in scripts/r3_mcts_sweep_batch.py): the batch splits across
    # the live trees, so the single-scene size would starve each tree and
    # multiply the dispatch rounds. Sharded evaluators need the row axis
    # divisible by the device count (the evaluator also self-pads, but
    # aligning here keeps every round at one stable jit shape).
    batch = max(mc.leaf_batch, mc.leaf_batch_multi)
    batch += (-batch) % msev.n_shards

    _EMPTY_ROUND = object()  # cached-terminal-only round: keep searching

    def collect_round():
        live = [
            si for si, t in enumerate(trees) if not (t.done or t.root.exhausted)
        ]
        if not live:
            return None
        quota = max(1, batch // len(live))
        rows_scene: List[int] = []
        rows_choices: List[np.ndarray] = []
        pend_per_scene: List[tuple] = []
        for si in live:
            pend = _collect_batch(trees[si], mc.alpha, quota)
            pend_per_scene.append((si, pend))
            for _, choices in pend:
                row = np.full(k_max, -1, np.int64)
                row[: trees[si].k] = choices
                rows_scene.append(si)
                rows_choices.append(row)
        if not rows_choices:
            # Every live tree's descents hit cached terminals this round -
            # host-side backups only (see uct_search's transient case).
            return _EMPTY_ROUND
        n_real = len(rows_choices)
        pad = (-n_real) % batch  # fixed batch-size multiples -> stable jit shapes
        for _ in range(pad):
            rows_scene.append(rows_scene[0])
            rows_choices.append(rows_choices[0])
        choices_arr = np.stack(rows_choices)
        costs_dev, _settled = msev.evaluate_async(
            np.asarray(rows_scene), choices_arr, choices_arr >= 0
        )
        return pend_per_scene, costs_dev

    def backup_round(round_result):
        pend_per_scene, costs_dev = round_result
        costs = np.asarray(costs_dev)
        ofs = 0
        for si, pend in pend_per_scene:
            _backup(trees[si], pend, costs[ofs : ofs + len(pend)])
            ofs += len(pend)

    # Same pipelined overlap as uct_search: later rounds' tree policy and
    # dispatch run while the device executes earlier ones, with up to
    # cfg.mcts.inflight_batches rounds outstanding (hides the axon tunnel
    # fetch latency behind the next device program).
    depth = max(1, mc.inflight_batches)
    inflight = []  # dispatched rounds, oldest first
    while time.monotonic() < deadline:
        nxt = collect_round()
        if nxt is not None and nxt is not _EMPTY_ROUND:
            inflight.append(nxt)
        if len(inflight) > depth or (nxt in (None, _EMPTY_ROUND) and inflight):
            backup_round(inflight.pop(0))
        if nxt is _EMPTY_ROUND:
            continue
        if nxt is None and not inflight:
            break

    # Deadline exit: drain the dispatched rounds (their device work is
    # already done; the best assignment of some scene may be in them).
    for r in inflight:
        backup_round(r)

    return [(t.best_assign, t.best_cost) for t in trees]


def _scene_search_inputs(estimates, sc, db, cfg):
    """Per-scene search inputs: (hyp_world [K,C,4,4], hyp_scores [K,C],
    obj_hulls) from the LCP-stage estimates."""
    k = len(estimates)
    c = min(cfg.mcts.branching, max(len(e.hypothesis_scores) for e in estimates))
    hyp_world = np.zeros((k, c, 4, 4), np.float32)
    hyp_scores = np.zeros((k, c), np.float32)
    obj_hulls = []
    # Host numpy, one matmul per object - NOT per-hypothesis jax to_world
    # calls: each np.asarray(jax op) is a synchronous ~31 ms axon round
    # trip, and k*c of them (75 for a 3-object scene) dominated the whole
    # MCTS stage (measured round 3).
    cam = np.asarray(sc.cam_pose, np.float32)
    for i, est in enumerate(estimates):
        obj = db[est.name]
        n_h = min(c, len(est.hypothesis_scores))
        if n_h > 0:
            hyps_cam = np.asarray(est.hypotheses[:n_h], np.float32)
            hyp_world[i, :n_h] = np.einsum("ij,njk->nik", cam, hyps_cam)
            hyp_scores[i, :n_h] = est.hypothesis_scores[:n_h]
        for j in range(n_h, c):
            hyp_world[i, j] = hyp_world[i, 0]
            hyp_scores[i, j] = -1.0
        obj_hulls.append(
            dict(
                hull_pts=obj.hull_pts,
                hull_mask=obj.hull_mask,
                hull_eqs=obj.hull_eqs,
                render_pts=obj.validation_pts,
                render_nrm=obj.validation_nrm,
                render_mask=np.ones(len(obj.validation_pts), bool),
            )
        )
    return hyp_world, hyp_scores, obj_hulls


def _segs_to_arrays(segs, k: int):
    """Normalize segments to ([k, N, 3], [k, N]) numpy - accepts a list of
    per-object Segment3D or one stacked Segment3D with a leading object
    axis; pads/truncates the object axis to k (padded rows: empty masks)."""
    if hasattr(segs, "pts"):  # stacked Segment3D
        pts = np.asarray(segs.pts, np.float32)
        mask = np.asarray(segs.mask)
    else:
        pts = np.stack([np.asarray(s.pts) for s in segs]).astype(np.float32)
        mask = np.stack([np.asarray(s.mask) for s in segs])
    n_obj, n = pts.shape[:2]
    if n_obj < k:
        pts = np.concatenate([pts, np.zeros((k - n_obj, n, 3), np.float32)])
        mask = np.concatenate([mask, np.zeros((k - n_obj, n), bool)])
    return pts[:k], mask[:k]


def _install_assignment(estimates, assign, settled_row, cam):
    """Write the settled world poses of the chosen assignment back into the
    per-object estimates (pose_cam recomputed through the camera).

    All host numpy: per-object jax compose calls would each pay the ~31 ms
    axon dispatch round trip."""
    cam = np.asarray(cam, np.float64)
    cam_inv = np.eye(4)
    cam_inv[:3, :3] = cam[:3, :3].T
    cam_inv[:3, 3] = -cam[:3, :3].T @ cam[:3, 3]
    out = []
    for i, est in enumerate(estimates):
        pose_w = settled_row[i]
        pose_cam = (cam_inv @ np.asarray(pose_w, np.float64)).astype(np.float32)
        out.append(
            dataclasses.replace(
                est,
                pose_cam=pose_cam,
                pose_world=np.asarray(pose_w),
                score=float(est.hypothesis_scores[assign[i]])
                if assign[i] < len(est.hypothesis_scores)
                else est.score,
            )
        )
    return out


def mcts_select(estimates, sc, db, table_pose, depth_clean, cfg, seed=0,
                snapshot_path=None, search="uct", segs=None):
    """MCTSSelection::selectBestPoses analogue: refine per-object pose choice
    by physics-aware search; installs the best state's poses + settled poses.

    segs: optional per-object 3D segments aligned with `estimates` (list of
    Segment3D or one stacked Segment3D). When given and cfg.mcts.tricp_final
    is on, the final pass adds the revived UCTState::performTrICP refinement
    (see _tricp_final_core) in the same single dispatch as the final settle.
    """
    k = len(estimates)
    if k == 0:
        return estimates
    hyp_world, hyp_scores, obj_hulls = _scene_search_inputs(estimates, sc, db, cfg)

    evaluator = BatchedLeafEvaluator(
        obj_hulls,
        hyp_world,
        np.asarray(depth_clean),
        sc.intrinsics,
        sc.cam_pose,
        table_pose,
        cfg,
    )
    if search == "greedy":
        from physimglobalpose_tpu.pipeline.greedy_search import greedy_bfs_search

        assign, best_cost = greedy_bfs_search(evaluator, hyp_scores, cfg)
    else:
        assign, best_cost = uct_search(evaluator, hyp_scores, cfg, seed=seed)
    if snapshot_path:
        from physimglobalpose_tpu.utils.checkpoint import save_search_snapshot

        save_search_snapshot(snapshot_path, sc.scene_dir, assign, best_cost, seed)

    # Final pass: settle the chosen assignment with the FULL hulls and read
    # back poses (the search may have used decimated contact hulls). With
    # segments available, the same dispatch also runs the TrICP refinement
    # and installs the min-cost of {raw, tricp->settle, settle->tricp}.
    if cfg.mcts.tricp_final and segs is not None:
        seg_pts, seg_mask = _segs_to_arrays(segs, k)
        costs3, settled3 = evaluator.evaluate_final_tricp(
            assign, np.ones(k, bool), seg_pts, seg_mask
        )
        settled_row = settled3[_tricp_pick(costs3)]
        if cfg.mcts.final_polish_rounds > 0:
            pev = evaluator
            if cfg.mcts.final_polish_scale != cfg.mcts.render_scale:
                pev = BatchedLeafEvaluator(
                    obj_hulls, hyp_world, np.asarray(depth_clean),
                    sc.intrinsics, sc.cam_pose, table_pose, cfg,
                    render_scale=cfg.mcts.final_polish_scale,
                )
            settled_row, _c = _final_polish(
                pev, settled_row, np.ones(k, bool), cfg, seed=seed
            )
    else:
        choices = assign[None, :]
        active = np.ones((1, k), bool)
        _, settled = evaluator.evaluate_final(choices, active)
        settled_row = settled[0]
    return _install_assignment(estimates, assign, settled_row, sc.cam_pose)


def mcts_select_multi(scene_rows, db, cfg, seed=0, mesh=None, segs_list=None):
    """Physics-aware MCTS selection for MANY scenes in shared device batches.

    scene_rows: list of (estimates, sc, table_pose, depth_clean) tuples, one
    per scene (the per-scene inputs mcts_select takes). All S searches run
    concurrently through one MultiSceneLeafEvaluator - pending leaves from
    every still-running tree share each device dispatch, and the final
    chosen-assignment settles of all scenes run as one batch.

    segs_list: optional per-scene segments aligned with scene_rows (each a
    stacked Segment3D or per-object list); enables the final-pass TrICP
    refinement (cfg.mcts.tricp_final) for every scene in the same dispatch.

    mesh: optional jax.sharding.Mesh - shards every leaf-eval batch's row
    axis over all mesh devices (see MultiSceneLeafEvaluator); the host trees
    are unchanged, so results match the unsharded path.

    Returns the per-scene refined estimates lists, in input order.
    """
    live = [(i, row) for i, row in enumerate(scene_rows) if len(row[0]) > 0]
    out: List[list] = [row[0] for row in scene_rows]
    if not live:
        return out

    evaluators = []
    hyp_scores_list = []
    for _, (estimates, sc, table_pose, depth_clean) in live:
        hyp_world, hyp_scores, obj_hulls = _scene_search_inputs(
            estimates, sc, db, cfg
        )
        evaluators.append(
            BatchedLeafEvaluator(
                obj_hulls, hyp_world, np.asarray(depth_clean), sc.intrinsics,
                sc.cam_pose, table_pose, cfg,
            )
        )
        hyp_scores_list.append(hyp_scores)

    msev = MultiSceneLeafEvaluator(evaluators, mesh=mesh)
    results = uct_search_multi(msev, hyp_scores_list, cfg, seed=seed)

    # Final pass: settle every scene's chosen assignment in one dispatch,
    # with the FULL hulls (the search may have used decimated ones); with
    # segments, the same dispatch adds the TrICP refinement per scene.
    s = len(live)
    scene_idx = np.arange(s)
    choices = np.full((s, msev.k_max), -1, np.int64)
    active = np.zeros((s, msev.k_max), bool)
    for si, (assign, _cost) in enumerate(results):
        choices[si, : len(assign)] = assign
        active[si, : len(assign)] = True

    if cfg.mcts.tricp_final and segs_list is not None:
        seg_rows = [_segs_to_arrays(segs_list[orig_i], msev.k_max)
                    for orig_i, _row in live]
        seg_pts = np.stack([r[0] for r in seg_rows])
        seg_mask = np.stack([r[1] for r in seg_rows])
        costs3, settled3 = msev.evaluate_final_tricp(
            choices, active, seg_pts, seg_mask
        )
        best_path = np.asarray([_tricp_pick(costs3[si]) for si in range(s)])
        settled = settled3[np.arange(s), best_path]
        if cfg.mcts.final_polish_rounds > 0:
            # Per-scene polish through each scene's own evaluator at the
            # polish render scale (k_max padding rows stay untouched -
            # active only covers real objects).
            settled = settled.copy()
            for si in range(s):
                k_s = evaluators[si].k
                pev = evaluators[si]
                if cfg.mcts.final_polish_scale != cfg.mcts.render_scale:
                    orig_i, (estimates, sc_i, table_pose_i, depth_clean_i) = live[si]
                    hw_i, _hs, hulls_i = _scene_search_inputs(
                        estimates, sc_i, db, cfg
                    )
                    pev = BatchedLeafEvaluator(
                        hulls_i, hw_i, np.asarray(depth_clean_i),
                        sc_i.intrinsics, sc_i.cam_pose, table_pose_i, cfg,
                        render_scale=cfg.mcts.final_polish_scale,
                    )
                polished, _c = _final_polish(
                    pev, settled[si, :k_s], np.ones(k_s, bool), cfg,
                    seed=seed + si,
                )
                settled[si, :k_s] = polished
    else:
        _, settled = msev.evaluate_final(scene_idx, choices, active)

    for si, (orig_i, (estimates, sc, _tp, _dc)) in enumerate(live):
        assign, _cost = results[si]
        out[orig_i] = _install_assignment(
            estimates, assign, settled[si, : len(estimates)], sc.cam_pose,
        )
    return out
