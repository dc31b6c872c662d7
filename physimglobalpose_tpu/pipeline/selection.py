"""Hypothesis selection: LCP best-pose + symmetry-aware greedy clustering.

Reference (HypothesisSelection.cpp): LCPSelection takes the generation
stage's best hypothesis as the final pose per object (:117-239);
greedyClustering (:66-115) prunes hypotheses below 0.5x the best score, then
clusters by symmetry-folded pose distance (rot < 10 deg, trans < 2 cm)
accumulating votes. MCTS selection lives in pipeline/mcts.py.
"""

from __future__ import annotations

import functools

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp

from physimglobalpose_tpu.geometry import metrics, se3


def lcp_select(best_transform: jnp.ndarray, best_score: jnp.ndarray) -> jnp.ndarray:
    """LCP mode: the best-scoring hypothesis is the pose (identity if none)."""
    return jnp.where(best_score > 0, best_transform, jnp.eye(4))


@functools.partial(jax.jit, static_argnames=("rot_thresh_deg", "trans_thresh", "prune_factor"))
def greedy_cluster_votes(
    transforms: jnp.ndarray,  # [H, 4, 4]
    scores: jnp.ndarray,  # [H]
    sym: jnp.ndarray,  # [3]
    rot_thresh_deg: float = 10.0,
    trans_thresh: float = 0.02,
    prune_factor: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Vote accumulation over pose clusters (HypothesisSelection.cpp:66-115).

    The reference greedily absorbs sorted hypotheses into clusters; here every
    hypothesis pair is compared at once and each hypothesis's vote count is
    the number of surviving hypotheses within (rot, trans) distance - the
    same ranking signal without the sequential absorption.

    Returns (votes [H], keep [H] bool).
    """
    best = jnp.max(scores)
    keep = scores >= prune_factor * best

    rot = transforms[:, :3, :3]
    # Pairwise relative rotation errors, symmetry-folded.
    rel = jnp.einsum("hji,kjl->hkil", rot, rot)  # R_h^T R_k
    eul = se3.matrix_to_euler_xyz(rel) * (180.0 / jnp.pi)
    folded = metrics.fold_symmetry(eul, sym)
    rot_close = jnp.mean(folded, axis=-1) < rot_thresh_deg
    t = transforms[:, :3, 3]
    trans_close = jnp.linalg.norm(t[:, None] - t[None, :], axis=-1) < trans_thresh
    near = rot_close & trans_close & keep[None, :] & keep[:, None]
    votes = jnp.sum(near * jnp.where(keep, scores, 0.0)[None, :], axis=-1)
    return votes, keep


def cluster_select(
    transforms: jnp.ndarray, scores: jnp.ndarray, sym: jnp.ndarray
) -> jnp.ndarray:
    """Pick the pose with the highest cluster vote mass."""
    votes, keep = greedy_cluster_votes(transforms, scores, sym)
    votes = jnp.where(keep, votes, -1.0)
    return transforms[jnp.argmax(votes)]
