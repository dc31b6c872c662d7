"""Mesh-sharded MCTS leaf evaluation == single-device (VERDICT r3 #3).

The multi-scene leaf evaluator's (scene, leaf) row axis is embarrassingly
parallel (each row settles/renders its own scene copy), so sharding it over
the virtual 8-device mesh must reproduce the unsharded results exactly - the
host UCT trees then behave identically, chip count only changes wall-clock.
Small shapes throughout: XLA CPU collectives abort on an internal timeout
when the host is starved.
"""

import numpy as np
import pytest

import jax

from physimglobalpose_tpu.config import (
    MCTSConfig, PhysicsConfig, PipelineConfig, RenderConfig,
)
from physimglobalpose_tpu.parallel import mesh as mesh_mod
from physimglobalpose_tpu.pipeline import mcts

from tests.test_mcts import K_INTR, H, W, setup  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


def _two_scene_evaluators(setup):  # noqa: F811
    cfg, obj, obs, true_pose, table_pose, cam_pose = setup
    wrong = true_pose.copy()
    wrong[:3, 3] = [0.06, 0.04, 0.89]
    high = true_pose.copy()
    high[:3, 3] = [0.0, 0.0, 0.97]
    hyps_a = np.stack([true_pose, wrong])[None]  # scene A: 1 object, 2 hyps
    hyps_b = np.stack(
        [np.stack([true_pose, wrong]), np.stack([high, wrong])]
    )  # scene B: 2 objects, 2 hyps
    ev_a = mcts.BatchedLeafEvaluator(
        [obj], hyps_a, obs, K_INTR, cam_pose, table_pose, cfg, render_scale=1
    )
    ev_b = mcts.BatchedLeafEvaluator(
        [obj, obj], hyps_b, obs, K_INTR, cam_pose, table_pose, cfg,
        render_scale=1,
    )
    return cfg, ev_a, ev_b


def test_sharded_rows_match_single_device(setup, mesh8):  # noqa: F811
    cfg, ev_a, ev_b = _two_scene_evaluators(setup)
    plain = mcts.MultiSceneLeafEvaluator([ev_a, ev_b])
    sharded = mcts.MultiSceneLeafEvaluator([ev_a, ev_b], mesh=mesh8)
    assert sharded.n_shards == 8

    # 5 real rows (deliberately NOT a multiple of 8 - exercises the
    # internal padding) across both scenes, mixed partial assignments.
    scene_idx = np.array([0, 1, 1, 0, 1])
    choices = np.array(
        [[0, -1], [0, 0], [-1, 1], [1, -1], [1, 0]], np.int64
    )
    active = choices >= 0

    costs_p, settled_p = plain.evaluate(scene_idx, choices, active)
    costs_s, settled_s = sharded.evaluate(scene_idx, choices, active)
    np.testing.assert_allclose(
        costs_s[: len(scene_idx)], costs_p[: len(scene_idx)], rtol=1e-6
    )
    np.testing.assert_allclose(
        settled_s[: len(scene_idx)], settled_p[: len(scene_idx)],
        rtol=1e-5, atol=1e-6,
    )

    fc_p, fs_p = plain.evaluate_final(scene_idx, choices, active)
    fc_s, fs_s = sharded.evaluate_final(scene_idx, choices, active)
    assert fc_s.shape == (len(scene_idx),)  # padding stripped
    np.testing.assert_allclose(fc_s, fc_p[: len(scene_idx)], rtol=1e-6)
    np.testing.assert_allclose(
        fs_s, fs_p[: len(scene_idx)], rtol=1e-5, atol=1e-6
    )


def test_uct_search_multi_sharded_matches(setup, mesh8):  # noqa: F811
    """End-to-end: the concurrent searches pick the same assignments with
    the leaf batches sharded over the mesh (host trees are deterministic
    given identical leaf costs and seed)."""
    cfg, ev_a, ev_b = _two_scene_evaluators(setup)
    hyp_scores = [
        np.array([[0.9, 0.5]], np.float32),
        np.array([[0.9, 0.5], [0.8, 0.4]], np.float32),
    ]
    res_p = mcts.uct_search_multi(
        mcts.MultiSceneLeafEvaluator([ev_a, ev_b]), hyp_scores, cfg,
        seed=0, max_iterations=6,
    )
    res_s = mcts.uct_search_multi(
        mcts.MultiSceneLeafEvaluator([ev_a, ev_b], mesh=mesh8), hyp_scores,
        cfg, seed=0, max_iterations=6,
    )
    for (a_p, c_p), (a_s, c_s) in zip(res_p, res_s):
        np.testing.assert_array_equal(a_s, a_p)
        np.testing.assert_allclose(c_s, c_p, rtol=1e-6)
