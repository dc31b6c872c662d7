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

    def ucb(self, alpha: float, parent_n: int) -> float:
        n = self.n + self.virtual
        if n == 0:
            return -math.inf
        return self.qval / n - alpha * math.sqrt(2 * math.log(max(parent_n, 1)) / n)


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
        render_scale: int = 4,
    ):
        self.cfg = cfg
        k = len(obj_hulls)
        self.k = k
        self.num_hyp = hypotheses_world.shape[1]
        ph = cfg.physics
        p_max = max(h["hull_pts"].shape[0] for h in obj_hulls)
        f_max = max(h["hull_eqs"].shape[0] for h in obj_hulls)
        n_max = max(h["render_pts"].shape[0] for h in obj_hulls)
        hull_pts = np.zeros((k, p_max, 3), np.float32)
        hull_mask = np.zeros((k, p_max), bool)
        hull_eqs = np.tile(np.array([0, 0, 1, -1e9], np.float32), (k, f_max, 1))
        render_pts = np.zeros((k, n_max, 3), np.float32)
        render_mask = np.zeros((k, n_max), bool)
        inv_inertia = np.zeros((k, 3), np.float32)
        for i, h in enumerate(obj_hulls):
            hp = h["hull_pts"]
            hull_pts[i, : len(hp)] = hp
            hull_mask[i, : len(hp)] = h["hull_mask"][: len(hp)]
            he = h["hull_eqs"]
            hull_eqs[i, : len(he)] = he
            rp = h["render_pts"]
            render_pts[i, : len(rp)] = rp
            render_mask[i, : len(rp)] = h["render_mask"][: len(rp)]
            inv_inertia[i] = np.asarray(
                physics.box_inv_inertia(
                    jnp.asarray(hull_pts[i]), jnp.asarray(hull_mask[i]), ph.object_mass
                )
            )

        self.scene_const = dict(
            hull_pts=jnp.asarray(hull_pts),
            hull_mask=jnp.asarray(hull_mask),
            hull_eqs=jnp.asarray(hull_eqs),
            inv_inertia=jnp.asarray(inv_inertia),
        )
        self.render_pts = jnp.asarray(render_pts)
        self.render_mask = jnp.asarray(render_mask)
        self.hyp_world = jnp.asarray(hypotheses_world)
        self.table_pose = jnp.asarray(table_pose)
        self.cam_pose = jnp.asarray(cam_pose)
        self.cam_pose_inv = jnp.asarray(np.asarray(se3.invert_pose(jnp.asarray(cam_pose))))
        s = render_scale
        self.h = cfg.render.height // s
        self.w = cfg.render.width // s
        intr = intrinsics.copy().astype(np.float32)
        intr[:2] /= s
        self.intr = jnp.asarray(intr)
        obs = obs_depth[:: s, :: s][: self.h, : self.w]
        self.obs = jnp.asarray(obs.astype(np.float32))

        self._eval = jax.jit(self._evaluate_batch)

    def _evaluate_batch(self, choices: jnp.ndarray, active: jnp.ndarray):
        """choices: [B, K] hypothesis index per object (-1 = not placed);
        active: [B, K] bool. Returns (costs [B], settled world poses [B, K, 4, 4])."""
        cfg = self.cfg
        ph = cfg.physics

        def one(choice_row, active_row):
            # Gather world poses for the chosen hypotheses.
            safe_choice = jnp.clip(choice_row, 0, self.num_hyp - 1)
            poses_w = self.hyp_world[jnp.arange(self.k), safe_choice]  # [K, 4, 4]
            # Physics: placed objects are bodies; the *last* active one is
            # dynamic, previous are static (correctPhysics semantics).
            order_pos = jnp.cumsum(active_row.astype(jnp.int32)) - 1
            last_idx = jnp.max(jnp.where(active_row, order_pos, -1))
            is_dynamic = active_row & (order_pos == last_idx)
            inv_mass = jnp.where(is_dynamic, 1.0 / ph.object_mass, 0.0)
            scene = physics.PhysicsScene(
                hull_pts=self.scene_const["hull_pts"],
                hull_mask=self.scene_const["hull_mask"]
                & active_row[:, None],  # unplaced objects have no hull -> no contacts
                hull_eqs=self.scene_const["hull_eqs"],
                inv_mass=inv_mass,
                inv_inertia=self.scene_const["inv_inertia"],
                table_pose=self.table_pose,
                table_half_extents=jnp.asarray(ph.table_half_extents),
                # Unplaced objects must not collide in either role (their
                # hull_eqs would act as invisible static colliders at the
                # clipped hypothesis-0 pose); reference correctPhysics only
                # adds placed objects to the world (UCTState.cpp:208-270).
                body_active=active_row,
            )
            quat = se3.matrix_to_quat(poses_w[:, :3, :3])
            pos = poses_w[:, :3, 3]
            q2, p2 = physics.settle(
                scene, quat, pos,
                steps=ph.steps, substeps=ph.substeps, dt=ph.dt,
                gravity=ph.gravity, damping=ph.damping,
                friction=ph.friction, restitution=ph.restitution,
            )
            settled_w = se3.pose_from_rot_trans(se3.quat_to_matrix(q2), p2)
            # Render all placed objects in camera frame, composite.
            settled_cam = jnp.einsum("ij,kjl->kil", self.cam_pose_inv, settled_w)

            def render_one(i, buf):
                d = raster.render_object_depth(
                    settled_cam[i], self.render_pts[i],
                    self.render_mask[i] & active_row[i],
                    self.intr, self.h, self.w, radius=1,
                )
                return raster.composite_min(buf, d)

            depth = jax.lax.fori_loop(
                0, self.k, render_one, jnp.zeros((self.h, self.w), jnp.float32)
            )
            c = cost_mod.render_cost(self.obs, depth, cfg.render.explanation_threshold)
            return c, settled_w

        return jax.vmap(one)(choices, active)

    def evaluate(self, batch_choices: np.ndarray, batch_active: np.ndarray):
        costs, settled = self._eval(jnp.asarray(batch_choices), jnp.asarray(batch_active))
        return np.asarray(costs), np.asarray(settled)


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
    rng = np.random.default_rng(seed)
    root = _Node(depth=0, choice=-1, parent=None, children={})

    # Budget: sum_{i=0}^{k} branching^i expansions (UCTSearch.cpp:290-294;
    # the reference loop is `for ii=0; ii<=numObjects` so the i=0 term
    # counts), capped by cfg.mcts.max_expansions - a documented deviation:
    # 25^3+ expansions are intractable serially and unnecessary with batched
    # leaf evaluation, and the reference's own 60 s wall-clock cut typically
    # binds first anyway.
    budget = sum(c**i for i in range(0, k + 1))
    budget = min(budget, max_iterations or mc.max_expansions)
    deadline = time.monotonic() + mc.max_search_seconds

    best_cost = math.inf
    best_assign = np.zeros(k, np.int64)
    # Fallback: greedy-by-LCP assignment.
    best_assign[:] = np.argmax(hyp_scores[:, :c], axis=1)

    def assignment_of(node: _Node, rollout_tail: bool) -> np.ndarray:
        """Choices along the path to node, random tail to full depth."""
        choices = np.full(k, -1, np.int64)
        cur = node
        while cur.parent is not None:
            choices[cur.depth - 1] = cur.choice
            cur = cur.parent
        if rollout_tail:
            for d in range(node.depth, k):
                choices[d] = rng.integers(0, c)
        return choices

    expansions = 0
    while expansions < budget and time.monotonic() < deadline:
        # Collect a batch of leaves with virtual loss.
        pend: List[tuple] = []  # (node_to_backup, choices, depth_evaluated)
        for _ in range(mc.leaf_batch):
            node = root
            # Tree policy: descend fully-expanded nodes by min-UCB.
            while node.depth < k and len(node.children) == c:
                parent_n = node.n + node.virtual
                node = min(
                    node.children.values(), key=lambda ch: ch.ucb(mc.alpha, parent_n)
                )
            if node.depth < k:
                # Expand: best unexpanded child by hval (LCP), as the reference
                # does (UCTSearch.cpp:204-211).
                unexpanded = [
                    i for i in range(c) if i not in node.children
                ]
                pick = max(unexpanded, key=lambda i: hyp_scores[node.depth, i])
                child = _Node(
                    depth=node.depth + 1,
                    choice=pick,
                    parent=node,
                    children={},
                    hval=float(hyp_scores[node.depth, pick]),
                )
                node.children[pick] = child
                node = child
                expansions += 1
            # Virtual loss up the path.
            cur = node
            while cur is not None:
                cur.virtual += 1
                cur = cur.parent
            choices = assignment_of(node, rollout_tail=True)
            pend.append((node, choices))
            if expansions >= budget:
                break

        if not pend:
            break
        batch_choices = np.stack([p[1] for p in pend])
        batch_active = batch_choices >= 0
        costs, _ = evaluator.evaluate(batch_choices, batch_active)

        for (node, choices), cost_v in zip(pend, costs):
            cost_v = float(cost_v)
            if cost_v < best_cost:
                best_cost = cost_v
                best_assign = choices.copy()
            cur = node
            while cur is not None:
                cur.virtual -= 1
                cur.n += 1
                cur.qval += cost_v
                cur = cur.parent

    return best_assign, best_cost


def mcts_select(estimates, sc, db, table_pose, depth_clean, cfg, seed=0,
                snapshot_path=None, search="uct"):
    """MCTSSelection::selectBestPoses analogue: refine per-object pose choice
    by physics-aware search; installs the best state's poses + settled poses."""
    k = len(estimates)
    if k == 0:
        return estimates
    c = min(cfg.mcts.branching, max(len(e.hypothesis_scores) for e in estimates))

    hyp_world = np.zeros((k, c, 4, 4), np.float32)
    hyp_scores = np.zeros((k, c), np.float32)
    obj_hulls = []
    cam = jnp.asarray(sc.cam_pose)
    for i, est in enumerate(estimates):
        obj = db[est.name]
        n_h = min(c, len(est.hypothesis_scores))
        for j in range(n_h):
            hyp_world[i, j] = np.asarray(
                se3.to_world(jnp.asarray(est.hypotheses[j]), cam)
            )
            hyp_scores[i, j] = est.hypothesis_scores[j]
        for j in range(n_h, c):
            hyp_world[i, j] = hyp_world[i, 0]
            hyp_scores[i, j] = -1.0
        obj_hulls.append(
            dict(
                hull_pts=obj.hull_pts,
                hull_mask=obj.hull_mask,
                hull_eqs=obj.hull_eqs,
                render_pts=obj.validation_pts,
                render_mask=np.ones(len(obj.validation_pts), bool),
            )
        )

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

    # Final pass: settle the chosen assignment and read back poses.
    choices = assign[None, :]
    active = np.ones((1, k), bool)
    _, settled = evaluator.evaluate(choices, active)
    cam_inv = se3.invert_pose(cam)
    out = []
    for i, est in enumerate(estimates):
        pose_w = settled[0, i]
        pose_cam = np.asarray(se3.compose(cam_inv, jnp.asarray(pose_w)))
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
