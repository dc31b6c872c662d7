"""Fused hypothesis-scoring pipeline: coarse LCP -> top-k ICP -> fine LCP.

The reference scores every congruent-set transform with a full-resolution
kd-tree LCP (match4pcsBase.cc:1885-1914) and refines only post-hoc. On TPU
the throughput-optimal shape is hierarchical: score the full hypothesis set
against a subsampled validation cloud (4x cheaper, ranking-faithful), then
spend ICP + full-resolution LCP only on the surviving top-K. One jitted
program; a single scalar fetch drives the whole pipeline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp

from physimglobalpose_tpu.ops import icp as icp_mod
from physimglobalpose_tpu.ops import lcp as lcp_mod


class ScoredHypotheses(NamedTuple):
    top_transforms: jnp.ndarray  # [K, 4, 4] refined
    top_scores: jnp.ndarray  # [K] full-resolution weighted LCP
    coarse_scores: jnp.ndarray  # [H]


@functools.partial(
    jax.jit,
    static_argnames=(
        "top_k", "coarse_subsample", "icp_iters", "icp_subsample", "delta",
        "normal_gate_deg", "use_pallas", "icp_nn_refresh",
        "coarse_precision", "fine_precision", "coarse_weighted",
        "fine_exact_k",
    ),
)
def score_refine_pipeline(
    transforms: jnp.ndarray,  # [H, 4, 4]
    model_search_pts: jnp.ndarray,  # [Nm, 3] sparse cloud (ICP)
    model_search_nrm: jnp.ndarray,
    model_validation_pts: jnp.ndarray,  # [Nv, 3] dense cloud (LCP)
    model_validation_nrm: jnp.ndarray,
    seg_pts: jnp.ndarray,
    seg_nrm: jnp.ndarray,
    seg_prob: jnp.ndarray,
    seg_mask: jnp.ndarray,
    top_k: int = 1024,
    coarse_subsample: int = 4,
    icp_iters: int = 10,
    icp_subsample: int = 1,
    delta: float = 0.005,
    normal_gate_deg: float = 30.0,
    use_pallas: bool | None = None,
    icp_nn_refresh: int = 1,
    coarse_precision: str | None = None,
    fine_precision: str | None = None,
    coarse_weighted: bool = True,
    fine_exact_k: int = 0,
) -> ScoredHypotheses:
    """Score all H hypotheses coarsely, refine + rescore the best top_k."""
    h = transforms.shape[0]
    k = min(top_k, h)

    # Stage 1: coarse LCP on a strided validation subsample.
    coarse_pts = model_validation_pts[::coarse_subsample]
    coarse_nrm = model_validation_nrm[::coarse_subsample]
    # coarse_precision="default" runs the ranking pass in 1 bf16 MXU pass
    # (~6x the f32 matmul rate); its ~5e-5 d^2 noise only perturbs points in
    # a ~5 mm band around delta, and the ranking-fidelity tests
    # (tests/test_scoring_clutter.py) hold because the fine stage rescores
    # the survivors exactly.
    # coarse_weighted=False ranks by the plain within-delta count (Verify
    # semantics) - skips the whole normal-agreement matmul and its
    # reductions; the exact weighted fine stage re-applies the gate.
    coarse = lcp_mod.lcp_scores(
        transforms, coarse_pts, coarse_nrm,
        seg_pts, seg_nrm, seg_prob, seg_mask,
        delta=delta, normal_gate_deg=normal_gate_deg,
        weighted=coarse_weighted, use_pallas=use_pallas,
        matmul_precision=coarse_precision,
    )

    # Stage 2: top-k survivors get batched ICP refinement. Measured on v5e:
    # the XLA formulation (bandwidth-bound, ~270 ms for 1024x10it) beats the
    # Pallas kernel (~410 ms - its K=128 padding costs 25x the real FLOPs at
    # ICP's small working set), so XLA is the default here.
    _, idx = jax.lax.top_k(coarse, k)
    top_tfs = transforms[idx]
    refined = icp_mod.refine_icp(
        top_tfs,
        model_search_pts[::icp_subsample],
        model_search_nrm[::icp_subsample],
        seg_pts, seg_mask,
        iters=icp_iters, point_to_plane=True, nn_refresh=icp_nn_refresh,
    )

    # Stage 3: full-resolution weighted LCP on the refined survivors.
    fine = lcp_mod.lcp_scores(
        refined, model_validation_pts, model_validation_nrm,
        seg_pts, seg_nrm, seg_prob, seg_mask,
        delta=delta, normal_gate_deg=normal_gate_deg,
        weighted=True, use_pallas=use_pallas,
        matmul_precision=fine_precision,
    )
    if fine_exact_k and fine_precision == "default":
        # Two-tier fine: the bulk rescoring ran in one bf16 MXU pass; the
        # top fine_exact_k survivors (>= what the product consumes) get an
        # exact fp32 rescore so the reported winners carry exact scores.
        _, idx_e = jax.lax.top_k(fine, min(fine_exact_k, k))
        exact = lcp_mod.lcp_scores(
            refined[idx_e], model_validation_pts, model_validation_nrm,
            seg_pts, seg_nrm, seg_prob, seg_mask,
            delta=delta, normal_gate_deg=normal_gate_deg,
            weighted=True, use_pallas=use_pallas,
        )
        fine = fine.at[idx_e].set(exact)
    order = jnp.argsort(-fine)
    return ScoredHypotheses(
        top_transforms=refined[order],
        top_scores=fine[order],
        coarse_scores=coarse,
    )
