"""Final-state trimmed ICP (UCTState::performTrICP revived, VERDICT r4 #2).

A box observed at a known pose with a perturbed chosen hypothesis: the TrICP
final pass must pull the pose back onto the observed segment, never regress
the render cost (the raw path is one of the candidates), and honor the
unexplained-point removal (UCTState.cpp:158-175) when a neighbor's points
contaminate the segment.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from physimglobalpose_tpu.config import (
    MCTSConfig, PhysicsConfig, PipelineConfig, RenderConfig,
)
from physimglobalpose_tpu.ops import raster
from physimglobalpose_tpu.pipeline import mcts

from test_mcts import K_INTR, H, W, box_cloud, setup  # noqa: F401 (fixture)


def _rot_z(deg):
    c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
    r = np.eye(4, dtype=np.float32)
    r[:2, :2] = [[c, -s], [s, c]]
    return r


def _seg_of(cloud, pose, n_pad=None):
    """Camera-frame segment = the cloud at the true pose (world == camera)."""
    pts = (cloud @ pose[:3, :3].T + pose[:3, 3]).astype(np.float32)
    n = len(pts) if n_pad is None else n_pad
    seg_pts = np.zeros((n, 3), np.float32)
    seg_mask = np.zeros(n, bool)
    seg_pts[: len(pts)] = pts
    seg_mask[: len(pts)] = True
    return seg_pts, seg_mask


def test_tricp_final_recovers_perturbed_pose(setup):  # noqa: F811
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    # Chosen hypothesis: 1.5 cm off + 8 deg yaw - the just-over-2cm-ADDS
    # regime the hard-family MCTS misses live in.
    perturbed = (_rot_z(8.0) @ true_pose).astype(np.float32)
    perturbed[:3, 3] = true_pose[:3, 3] + [0.015, -0.01, 0.0]
    hyps = np.stack([perturbed, perturbed])[None]  # [K=1, C=2]
    ev = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    seg_pts, seg_mask = _seg_of(obj["render_pts"], true_pose)
    costs3, settled3 = ev.evaluate_final_tricp(
        np.array([0]), np.ones(1, bool), seg_pts[None], seg_mask[None]
    )
    assert costs3.shape == (3,) and settled3.shape == (3, 1, 4, 4)
    # Raw path (row 0) keeps the perturbation; the winner fixes it.
    raw_err = np.linalg.norm(settled3[0, 0][:3, 3] - true_pose[:3, 3])
    best = mcts._tricp_pick(costs3)  # the product's selection rule
    ref_err = np.linalg.norm(settled3[best, 0][:3, 3] - true_pose[:3, 3])
    assert best != 0, f"TrICP never won: costs {costs3}"
    assert ref_err < raw_err
    assert ref_err < 0.006, f"refined translation error {ref_err:.4f} m"
    # And the installed cost never regresses vs the raw final settle.
    costs_raw, _ = ev.evaluate_final(np.array([[0]]), np.ones((1, 1), bool))
    assert costs3.min() <= costs_raw[0] + 1e-4


def test_tricp_removal_ignores_neighbor_points():
    # Two boxes side by side; object 1's segment is contaminated with points
    # of object 0 (already placed, correct pose). With the 8 mm removal the
    # ICP of object 1 must converge to ITS true pose instead of being pulled
    # toward the contamination centroid.
    cfg = PipelineConfig(
        render=RenderConfig(width=W, height=H),
        physics=PhysicsConfig(steps=30),
        mcts=MCTSConfig(),
    )
    cloud = box_cloud()
    pose0 = np.eye(4, dtype=np.float32)
    pose0[:3, 3] = [0.0, 0.0, 0.89]
    pose1 = np.eye(4, dtype=np.float32)
    pose1[:3, 3] = [0.075, 0.0, 0.89]  # 7.5 cm apart: faces 1.5 cm apart
    init1 = pose1.copy()
    init1[:3, 3] += [-0.012, 0.008, 0.0]  # perturbed start for object 1

    pts0 = cloud + pose0[:3, 3]
    pts1 = cloud + pose1[:3, 3]
    # Object 1's segment: its own points + object-0 contamination.
    contam = np.concatenate([pts1, pts0[:200]]).astype(np.float32)
    n = len(contam)
    seg_pts = np.zeros((2, n, 3), np.float32)
    seg_mask = np.zeros((2, n), bool)
    seg_pts[0, : len(pts0)] = pts0
    seg_mask[0, : len(pts0)] = True
    seg_pts[1] = contam
    seg_mask[1] = True

    model_pts = jnp.asarray(np.stack([cloud, cloud]))
    model_nrm = jnp.zeros_like(model_pts)
    model_mask = jnp.ones((2, len(cloud)), bool)
    poses_c = jnp.asarray(np.stack([pose0, init1]))
    refined = np.asarray(
        mcts._tricp_refine_cam(
            poses_c, model_pts, model_nrm, model_mask,
            jnp.asarray(seg_pts), jnp.asarray(seg_mask),
            jnp.ones(2, bool), cfg,
        )
    )
    # Object 0 (clean segment, exact start) stays put.
    np.testing.assert_allclose(refined[0], pose0, atol=1e-3)
    err1 = np.linalg.norm(refined[1][:3, 3] - pose1[:3, 3])
    assert err1 < 0.005, f"object 1 error {err1:.4f} m with contamination"


def test_tricp_degenerate_segment_passes_through(setup):  # noqa: F811
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    hyps = np.stack([true_pose, true_pose])[None]
    ev = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    # Empty segment: TrICP must not corrupt the pose (all three candidate
    # rows equal the raw settle).
    seg_pts = np.zeros((1, 64, 3), np.float32)
    seg_mask = np.zeros((1, 64), bool)
    costs3, settled3 = ev.evaluate_final_tricp(
        np.array([0]), np.ones(1, bool), seg_pts, seg_mask
    )
    np.testing.assert_allclose(settled3[1], settled3[0], atol=1e-5)
    np.testing.assert_allclose(settled3[2], settled3[0], atol=1e-5)


def test_final_polish_descends_render_cost(setup):  # noqa: F811
    # The pixel-cost polish must pull a 1.5 cm-off pose toward the observed
    # depth WITHOUT any segment input (it descends the render cost itself -
    # the lever for occluded fragments where ICP stalls, ROUND5_NOTES).
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    perturbed = (_rot_z(6.0) @ true_pose).astype(np.float32)
    perturbed[:3, 3] = true_pose[:3, 3] + [0.012, -0.008, 0.0]
    hyps = np.stack([perturbed, perturbed])[None]
    ev = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    import dataclasses

    cfg = dataclasses.replace(  # polish ships opt-in; enable for the test
        cfg, mcts=dataclasses.replace(cfg.mcts, final_polish_rounds=3)
    )
    start = perturbed[None]  # [K=1, 4, 4] world == camera here
    polished, cost = mcts._final_polish(ev, start, np.ones(1, bool), cfg, seed=0)
    start_cost = float(np.asarray(mcts._poses_cost_jit(
        ev.consts_full, cfg, ev.h, ev.w, ev.splat_radius,
        jnp.asarray(start[None]), jnp.ones(1, bool))).ravel()[0])
    assert cost <= start_cost
    err0 = np.linalg.norm(start[0][:3, 3] - true_pose[:3, 3])
    err1 = np.linalg.norm(polished[0][:3, 3] - true_pose[:3, 3])
    assert err1 < err0, f"polish moved away: {err0:.4f} -> {err1:.4f}"
    assert err1 < 0.008, f"polished translation error {err1:.4f} m"


def test_tricp_multi_matches_single(setup):  # noqa: F811
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    perturbed = (_rot_z(8.0) @ true_pose).astype(np.float32)
    perturbed[:3, 3] = true_pose[:3, 3] + [0.015, -0.01, 0.0]
    hyps = np.stack([perturbed, perturbed])[None]
    ev_a = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    ev_b = mcts.BatchedLeafEvaluator(
        [obj], hyps, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    msev = mcts.MultiSceneLeafEvaluator([ev_a, ev_b])
    seg_pts, seg_mask = _seg_of(obj["render_pts"], true_pose)
    costs_m, settled_m = msev.evaluate_final_tricp(
        np.zeros((2, 1), np.int64), np.ones((2, 1), bool),
        np.stack([seg_pts[None]] * 2), np.stack([seg_mask[None]] * 2),
    )
    costs_s, settled_s = ev_a.evaluate_final_tricp(
        np.array([0]), np.ones(1, bool), seg_pts[None], seg_mask[None]
    )
    np.testing.assert_allclose(costs_m[0], costs_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(settled_m[0], settled_s, rtol=1e-4, atol=1e-4)
