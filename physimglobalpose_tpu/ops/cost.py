"""Pixel-wise scene explanation cost.

Reference (UCTState::computeCost, UCTState.cpp:93-116): over all pixels with
|observed - rendered| > 1 cm, count obScore (observed occupied), renScore
(rendered occupied), intScore (both); renderScore = obScore + renScore -
intScore, lower is better. Batched over [B, H, W] depth stacks.
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax.numpy as jnp


def render_cost(
    obs_depth: jnp.ndarray,  # [..., H, W]
    ren_depth: jnp.ndarray,  # [..., H, W]
    threshold: float = 0.01,
) -> jnp.ndarray:
    """The 3-term unexplained-pixel count; lower is better. Returns [...]."""
    diff_big = jnp.abs(obs_depth - ren_depth) > threshold
    ob = (obs_depth > 0) & diff_big
    ren = (ren_depth > 0) & diff_big
    inter = ob & ren
    return (
        jnp.sum(ob, axis=(-2, -1))
        + jnp.sum(ren, axis=(-2, -1))
        - jnp.sum(inter, axis=(-2, -1))
    ).astype(jnp.float32)
