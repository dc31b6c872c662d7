"""MCTS controller tests on a tiny synthetic scene.

One box object observed at a known pose: the search must pick the hypothesis
whose render matches the observed depth, not the higher-LCP decoy."""

import numpy as np
import pytest

import jax.numpy as jnp

from physimglobalpose_tpu.config import (
    MCTSConfig, PhysicsConfig, PipelineConfig, RenderConfig,
)
from physimglobalpose_tpu.geometry import se3
from physimglobalpose_tpu.ops import raster
from physimglobalpose_tpu.pipeline import mcts

K_INTR = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]], dtype=np.float32)
H, W = 120, 160


def box_cloud(n=600, size=0.06, seed=0):
    rng = np.random.default_rng(seed)
    faces = rng.integers(0, 6, n)
    u, v = rng.uniform(-0.5, 0.5, (2, n))
    pts = np.zeros((n, 3), np.float32)
    for i, f in enumerate(faces):
        ax, sign = f // 2, 1 if f % 2 == 0 else -1
        dims = [d for d in range(3) if d != ax]
        pts[i, ax] = sign * size / 2
        pts[i, dims[0]] = u[i] * size
        pts[i, dims[1]] = v[i] * size
    return pts


@pytest.fixture(scope="module")
def setup():
    cfg = PipelineConfig(
        render=RenderConfig(width=W, height=H),
        physics=PhysicsConfig(steps=30),
        mcts=MCTSConfig(leaf_batch=4, branching=3, max_search_seconds=30.0),
    )
    cloud = box_cloud()
    cam_pose = np.eye(4, dtype=np.float32)  # world == camera
    # Gravity is -z; table CENTER so its top face sits at z = 0.86
    # (half-extent 0.2 -> center 0.66); the box rests at 0.86 + 0.03 = 0.89.
    table_pose = np.eye(4, dtype=np.float32)
    table_pose[2, 3] = 0.66
    true_pose = np.eye(4, dtype=np.float32)
    true_pose[:3, 3] = [0.0, 0.0, 0.89]

    obs = np.asarray(
        raster.render_object_depth(
            jnp.asarray(true_pose), jnp.asarray(cloud), jnp.ones(len(cloud), bool),
            jnp.asarray(K_INTR), H, W, radius=1,
        )
    )
    hull_pts = box_cloud(n=16, seed=1)
    sx = 0.03
    eqs = np.array(
        [[1, 0, 0, -sx], [-1, 0, 0, -sx], [0, 1, 0, -sx],
         [0, -1, 0, -sx], [0, 0, 1, -sx], [0, 0, -1, -sx]], np.float32,
    )
    hull_eqs = np.tile(np.array([0, 0, 1, -1e9], np.float32), (96, 1))
    hull_eqs[:6] = eqs
    obj = dict(
        hull_pts=np.array(
            [[x, y, z] for x in (-sx, sx) for y in (-sx, sx) for z in (-sx, sx)],
            np.float32,
        ),
        hull_mask=np.ones(8, bool),
        hull_eqs=hull_eqs,
        render_pts=cloud,
        render_mask=np.ones(len(cloud), bool),
    )
    return cfg, obj, obs, true_pose, table_pose, cam_pose


def test_evaluator_prefers_true_pose(setup):
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    wrong = true_pose.copy()
    wrong[:3, 3] = [0.06, 0.04, 0.89]
    hyps = np.stack([true_pose, wrong])[None]  # [K=1, C=2, 4, 4]
    ev = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    choices = np.array([[0], [1]])
    active = np.ones((2, 1), bool)
    costs, settled = ev.evaluate(choices, active)
    assert costs[0] < costs[1]
    # Settled pose of the true hypothesis stays near the initial pose.
    assert np.linalg.norm(settled[0, 0][:3, 3] - true_pose[:3, 3]) < 0.04


def test_unplaced_object_does_not_collide(setup):
    # Partial assignment (-1 choice): the unplaced object's hypothesis-0 pose
    # sits directly under the placed object's fall path. It must NOT act as
    # an invisible static collider (ADVICE r1 medium): the placed box settles
    # on the table at its hypothesis height, not on top of the phantom.
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    blocker = true_pose.copy()  # phantom directly below the placed object
    blocker[:3, 3] = [0.0, 0.0, 0.89]
    placed = true_pose.copy()
    placed[:3, 3] = [0.0, 0.0, 0.97]
    hyps = np.stack([np.stack([blocker, blocker]), np.stack([placed, placed])])
    ev = mcts.BatchedLeafEvaluator(
        [obj, obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    choices = np.array([[-1, 0]])  # object 0 unplaced, object 1 at `placed`
    active = choices >= 0
    _, settled = ev.evaluate(choices, active)
    # Falls through the phantom to rest on the table: z = 0.86 + 0.03 = 0.89.
    z = settled[0, 1][2, 3]
    np.testing.assert_allclose(z, 0.89, atol=0.02)


def test_uct_search_picks_matching_hypothesis(setup):
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    decoy = true_pose.copy()
    decoy[:3, 3] = [0.07, 0.05, 0.89]
    decoy2 = true_pose.copy()
    decoy2[:3, 3] = [-0.06, 0.03, 0.95]
    hyps = np.stack([decoy, true_pose, decoy2])[None]  # true pose is choice 1
    ev = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    # Decoy has the higher LCP heuristic - search must still find the truth.
    hyp_scores = np.array([[0.9, 0.5, 0.8]], np.float32)
    assign, best_cost = mcts.uct_search(ev, hyp_scores, cfg, seed=0, max_iterations=10)
    assert assign[0] == 1


def test_tree_exhaustion_terminates_enumeration():
    # k=1, c=3: the whole assignment space is 3 terminals. Once all three are
    # cached the root must be marked exhausted so the search stops instead of
    # re-backing-up cached costs until the wall-clock deadline.
    tree = mcts._make_tree(
        np.array([[0.9, 0.5, 0.8]], np.float32), k=1, c=3, budget=100, seed=0
    )
    pend = mcts._collect_batch(tree, alpha=5000.0, quota=3)
    assert len(pend) == 3 and not tree.root.exhausted
    mcts._backup(tree, pend, [2.0, 1.0, 3.0])
    assert tree.root.exhausted
    assert all(ch.exhausted for ch in tree.root.children.values())
    # Best assignment is the min-cost terminal (pend row 1, cost 1.0).
    assert tree.best_cost == 1.0
    assert tree.best_assign[0] == pend[1][1][0]


def test_deadline_drains_final_inflight_batch(setup, monkeypatch):
    # Deadline expiry with a dispatched-but-not-backed-up batch: the batch's
    # device work is done, so its results must be drained - losing it can
    # return a strictly worse assignment than the search evaluated.
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    decoy = true_pose.copy()
    decoy[:3, 3] = [0.07, 0.05, 0.89]
    decoy2 = true_pose.copy()
    decoy2[:3, 3] = [-0.06, 0.03, 0.95]
    hyps = np.stack([decoy, true_pose, decoy2])[None]  # truth at slot 1
    ev = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    hyp_scores = np.array([[0.9, 0.5, 0.8]], np.float32)

    # time.monotonic: deadline computation + first loop check pass, then the
    # clock jumps past the deadline -> exactly one batch is dispatched and
    # the loop exits with it in flight.
    import time as _time

    t0 = _time.monotonic()
    seq = iter([t0, t0])
    monkeypatch.setattr(mcts.time, "monotonic", lambda: next(seq, t0 + 1e9))
    assign, best_cost = mcts.uct_search(ev, hyp_scores, cfg, seed=0)
    # Without the drain, best_assign stays the argmax-LCP initialization
    # (the decoy, slot 0) and best_cost stays inf.
    assert np.isfinite(best_cost)
    assert assign[0] == 1


def test_multi_scene_search_matches_single(setup):
    # Two copies of the decoy scene with the true pose at different choice
    # slots: the shared-dispatch multi-scene search must recover both, and
    # agree with the single-scene search result.
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    decoy = true_pose.copy()
    decoy[:3, 3] = [0.07, 0.05, 0.89]
    decoy2 = true_pose.copy()
    decoy2[:3, 3] = [-0.06, 0.03, 0.95]

    hyps_a = np.stack([decoy, true_pose, decoy2])[None]  # truth at slot 1
    hyps_b = np.stack([true_pose, decoy2, decoy])[None]  # truth at slot 0
    ev_a = mcts.BatchedLeafEvaluator(
        [obj], hyps_a, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    ev_b = mcts.BatchedLeafEvaluator(
        [obj], hyps_b, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    msev = mcts.MultiSceneLeafEvaluator([ev_a, ev_b])
    scores_a = np.array([[0.9, 0.5, 0.8]], np.float32)
    scores_b = np.array([[0.5, 0.8, 0.9]], np.float32)
    results = mcts.uct_search_multi(
        msev, [scores_a, scores_b], cfg, seed=0, max_iterations=10
    )
    assert results[0][0][0] == 1
    assert results[1][0][0] == 0
    # And the shared-batch evaluator agrees with the per-scene one.
    costs_multi, settled_multi = msev.evaluate(
        np.array([0, 1]), np.array([[1], [0]]), np.ones((2, 1), bool)
    )
    costs_a, settled_a = ev_a.evaluate(np.array([[1]]), np.ones((1, 1), bool))
    np.testing.assert_allclose(costs_multi[0], costs_a[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        settled_multi[0, 0], settled_a[0, 0], rtol=1e-5, atol=1e-5
    )
