"""Greedy best-first search + evaluation driver tests."""

import json

import numpy as np
import pytest

from physimglobalpose_tpu.pipeline import evaluate, greedy_search


class FakeEvaluator:
    """Deterministic cost oracle: cost = sum of per-object choice penalties."""

    def __init__(self, penalties):
        self.penalties = np.asarray(penalties, np.float64)  # [K, C]
        self.k = self.penalties.shape[0]
        self.num_hyp = self.penalties.shape[1]
        self.calls = 0

    def evaluate(self, choices, active):
        self.calls += 1
        costs = np.zeros(len(choices))
        for i, row in enumerate(choices):
            for d, c in enumerate(row):
                if c >= 0:
                    costs[i] += self.penalties[d, c]
        settled = np.tile(np.eye(4, dtype=np.float32), (len(choices), self.k, 1, 1))
        return costs, settled


def test_greedy_bfs_finds_optimum():
    penalties = [[5.0, 1.0, 3.0], [2.0, 4.0, 0.5], [1.0, 9.0, 2.0]]
    ev = FakeEvaluator(penalties)
    hyp_scores = np.zeros((3, 3), np.float32)
    assign, cost = greedy_search.greedy_bfs_search(ev, hyp_scores, max_iters=50)
    np.testing.assert_array_equal(assign, [1, 2, 0])
    assert np.isclose(cost, 1.0 + 0.5 + 1.0)


def test_greedy_bfs_respects_budget():
    ev = FakeEvaluator(np.zeros((4, 5)))
    assign, cost = greedy_search.greedy_bfs_search(
        ev, np.zeros((4, 5), np.float32), max_iters=3
    )
    assert ev.calls <= 4  # expansions bounded (+1 for nothing)
    assert assign.shape == (4,)


def test_evaluate_resume(tmp_path, monkeypatch):
    log = str(tmp_path / "eval.jsonl")
    # Pre-populate one completed scene; the driver must skip it.
    with open(log, "w") as fh:
        fh.write(json.dumps({"scene": "/fake/a", "seconds": 1.0,
                             "objects": {"x": {"score": 0.5}}}) + "\n")
    calls = []

    def fake_estimate(sd, *a, **kw):
        calls.append(sd)

        class R:
            objects = []

        return R()

    monkeypatch.setattr(evaluate.api, "estimate_pose", fake_estimate)
    monkeypatch.setattr(
        evaluate.scene_mod, "load_scene",
        lambda sd, dataset=None: type("S", (), {"gt_poses": None})(),
    )
    agg = evaluate.evaluate_scenes(["/fake/a", "/fake/b"], db=None, log_path=log)
    assert calls == ["/fake/b"]  # /fake/a skipped
    assert agg["scenes"] == 2.0
    done = evaluate.completed_scenes(log)
    assert done == {"/fake/a", "/fake/b"}
