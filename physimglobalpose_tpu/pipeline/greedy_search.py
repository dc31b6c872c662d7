"""Greedy best-first search over object placement orders.

Reference: hypothesis_verification/greedy_bfs/{Search,State}.cpp - the
ICRA'17-style predecessor of the MCTS: a priority queue over partial scenes
ordered by heuristic value, expanding the best node (trimmed ICP + physics +
render per expansion, maxSearchIters=300). Present in the reference tree but
not compiled (SURVEY.md section 2.1 "dead code"); provided here as a working
alternative to MCTS because it shares the batched leaf evaluator - expansion
candidates are scored in device batches instead of one at a time.
"""

from __future__ import annotations

import heapq
import itertools
from typing import List, Tuple

import numpy as np

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.pipeline.mcts import BatchedLeafEvaluator


def greedy_bfs_search(
    evaluator: BatchedLeafEvaluator,
    hyp_scores: np.ndarray,  # [K, C]
    cfg: PipelineConfig = DEFAULT_CONFIG,
    max_iters: int = 300,
    beam: int = 8,
) -> Tuple[np.ndarray, float]:
    """Best-first search: expand the lowest-cost partial assignment.

    A node is a prefix assignment (choices for the first d objects). Children
    (all C choices for object d) are evaluated as one device batch. Returns
    (best complete assignment [K], its cost).
    """
    k = evaluator.k
    c = min(hyp_scores.shape[1], evaluator.num_hyp)
    counter = itertools.count()  # tie-break for heapq

    # Node: (cost, tiebreak, depth, choices tuple)
    root = (0.0, next(counter), 0, ())
    frontier: List[tuple] = [root]
    best_complete: Tuple[np.ndarray, float] | None = None
    iters = 0

    while frontier and iters < max_iters:
        cost, _, depth, prefix = heapq.heappop(frontier)
        # Prefix costs are NOT admissible lower bounds (placing an object can
        # explain observed pixels and *lower* render_cost), so the first
        # complete pop need not be optimal. Keep searching until the frontier
        # minimum (this pop, by heap order) exceeds the best complete cost.
        if best_complete is not None and cost >= best_complete[1]:
            break
        if depth == k:
            if best_complete is None or cost < best_complete[1]:
                best_complete = (np.asarray(prefix, np.int64), float(cost))
            continue
        # Expand: all C children in one batch.
        child_choices = np.full((c, k), -1, np.int64)
        for j in range(c):
            child_choices[j, :depth] = prefix
            child_choices[j, depth] = j
        active = child_choices >= 0
        costs, _ = evaluator.evaluate(child_choices, active)
        iters += 1
        order = np.argsort(costs)[:beam]  # keep the best few children
        for j in order:
            heapq.heappush(
                frontier,
                (float(costs[j]), next(counter), depth + 1, prefix + (int(j),)),
            )

    if best_complete is None:
        # Fallback: greedy by LCP heuristic.
        return np.argmax(hyp_scores[:, :c], axis=1), float("inf")
    return best_complete
