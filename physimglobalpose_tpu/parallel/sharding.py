"""Sharded variants of the hot pipeline stages.

The hypothesis batch H is this workload's long dimension (SURVEY.md section
5): LCP scoring, ICP refinement, and physics rollouts all batch over it.
Sharding H across the mesh's full device set gives near-linear scaling - each
chip scores its hypothesis shard against replicated model/segment clouds; the
only collective is the final top-k/argmax reduction (psum-sized, negligible).
"""

from __future__ import annotations

import functools

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from physimglobalpose_tpu.ops import icp, lcp


def sharded_lcp_scores(
    mesh: Mesh,
    transforms: jnp.ndarray,  # [H, 4, 4]
    model_pts, model_nrm, seg_pts, seg_nrm, seg_prob, seg_mask,
    delta: float = 0.005,
    normal_gate_deg: float = 30.0,
    weighted: bool = True,
    use_pallas: bool | None = None,
):
    """LCP scores with H sharded over every mesh axis."""
    h_shard = NamedSharding(mesh, P(("data", "model")))
    rep = NamedSharding(mesh, P())
    transforms = jax.device_put(transforms, NamedSharding(mesh, P(("data", "model"), None, None)))
    args = [
        jax.device_put(a, rep)
        for a in (model_pts, model_nrm, seg_pts, seg_nrm, seg_prob, seg_mask)
    ]

    @functools.partial(
        jax.jit,
        static_argnames=("delta", "normal_gate_deg", "weighted", "use_pallas"),
        out_shardings=h_shard,
    )
    def run(tf, mp, mn, sp, sn, spr, sm, delta, normal_gate_deg, weighted, use_pallas):
        return lcp.lcp_scores(
            tf, mp, mn, sp, sn, spr, sm,
            delta=delta, normal_gate_deg=normal_gate_deg,
            weighted=weighted, use_pallas=use_pallas,
        )

    return run(
        transforms, *args,
        delta=delta, normal_gate_deg=normal_gate_deg,
        weighted=weighted, use_pallas=use_pallas,
    )


def sharded_refine_icp(
    mesh: Mesh,
    transforms: jnp.ndarray,
    model_pts, model_nrm, seg_pts, seg_mask,
    iters: int = 20,
    trim_fraction: float = 0.8,
    max_corr_dist: float = 0.02,
    point_to_plane: bool = True,
):
    """Batched ICP with the hypothesis batch sharded over all devices."""
    rep = NamedSharding(mesh, P())
    h_shard = NamedSharding(mesh, P(("data", "model"), None, None))
    transforms = jax.device_put(transforms, h_shard)
    args = [jax.device_put(a, rep) for a in (model_pts, model_nrm, seg_pts, seg_mask)]

    @functools.partial(
        jax.jit,
        static_argnames=("iters", "trim_fraction", "max_corr_dist", "point_to_plane"),
        out_shardings=h_shard,
    )
    def run(tf, mp, mn, sp, sm, iters, trim_fraction, max_corr_dist, point_to_plane):
        return icp.refine_icp(
            tf, mp, mn, sp, sm,
            iters=iters, trim_fraction=trim_fraction,
            max_corr_dist=max_corr_dist, point_to_plane=point_to_plane,
        )

    return run(
        transforms, *args,
        iters=iters, trim_fraction=trim_fraction,
        max_corr_dist=max_corr_dist, point_to_plane=point_to_plane,
    )
