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
    # [K] weighted LCP, descending. With fine_seg_stride == 1 every entry is
    # full-resolution. With fine_seg_stride > 1 only the first fine_exact_k
    # entries carry exact full-resolution fp32 scores (the exact rescore
    # tier); the tail holds strided bulk-tier scores - systematically
    # deflated, and in rare NN-reassignment cases inflated - that are valid
    # for RANKING the tail but must not be consumed as calibrated scores.
    top_scores: jnp.ndarray
    coarse_scores: jnp.ndarray  # [H]


@functools.partial(
    jax.jit,
    static_argnames=(
        "top_k", "coarse_subsample", "icp_iters", "icp_subsample", "delta",
        "normal_gate_deg", "use_pallas", "icp_nn_refresh",
        "coarse_precision", "fine_precision", "coarse_weighted",
        "fine_exact_k", "icp_precision", "coarse_seg_stride",
        "icp_seg_stride", "fine_seg_stride", "coarse_topk_approx",
        "exact_precision", "fine_hb_lane_pack",
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
    # Mosaic supports only DEFAULT/HIGHEST dot precisions ("high" raises
    # NotImplementedError in the Pallas lowering); None = exact f32.
    icp_precision: str | None = None,
    coarse_seg_stride: int = 1,
    # ICP correspondences from a strided segment subsample: the solve is a
    # robust least squares over ~1k points, so halving the points halves
    # the correspondence matmuls with negligible pose effect (gated by the
    # on-TPU top-1-drift test at the production flags).
    icp_seg_stride: int = 1,
    # Segment stride for the BULK fine tier only. The bulk tier merely ranks
    # the top_k refined survivors down to fine_exact_k; the exact fp32
    # rescore then recomputes the winners' scores at full resolution, so a
    # strided bulk changes which near-ties survive into the exact tier but
    # never the reported scores. Requires the exact tier to be active
    # (fine_exact_k > 0 with a lowered fine_precision) - otherwise the bulk
    # IS the final score and striding it would silently change results, so
    # we raise instead.
    fine_seg_stride: int = 1,
    # Matmul precision for the exact rescore tier. None = true f32 (HIGHEST:
    # 6-pass bf16 emulation on the MXU); "high3" = the 3-pass hi/lo split
    # (ops/lcp._dot_high3, ~2x the MXU rate, ~1e-7 d^2 error vs the 2.5e-5
    # match threshold - fp32-grade for LCP; gated on-chip at the production
    # flags by tests/test_tpu_bf16.py).
    exact_precision: str | None = None,
    # Force (True) / forbid (False) the lane-packed hypothesis-batched
    # kernel layout for the BULK fine tier (ops/lcp.py hb_lane_pack). None =
    # the kernel's own auto rule (HB only when 8 whole model tiles fit the
    # lane budget - never at the fine tier's nv=4096).
    fine_hb_lane_pack: bool | None = None,
    # Select the coarse top-k with jax.lax.approx_max_k (TPU PartialReduce;
    # much cheaper than the exact sort over H=16384) instead of lax.top_k.
    # The coarse gate is already approximate by design (bf16, strided,
    # unweighted); recall loss only matters for the TRUE top scores, which
    # approx_max_k retains with the highest probability. NOT a production
    # flag: measured only by scripts/r3_glue_exact_probe.py (off-pipeline
    # survival probe with a hardcoded recall_target=0.95) and not covered by
    # the tests/test_tpu_bf16.py production gate, which runs with this off.
    coarse_topk_approx: bool = False,
) -> ScoredHypotheses:
    """Score all H hypotheses coarsely, refine + rescore the best top_k."""
    h = transforms.shape[0]
    k = min(top_k, h)

    # Stage 1: coarse LCP on a strided validation subsample.
    # coarse_seg_stride > 1 additionally strides the SEGMENT side of the
    # ranking pass (the d2 block shrinks in both dimensions; measured
    # exact-top-64 survival stays 64/64 at stride 2 on the clutter workload,
    # scripts/r3_lcp_micro.py + tests/test_tpu_bf16.py).
    coarse_pts = model_validation_pts[::coarse_subsample]
    coarse_nrm = model_validation_nrm[::coarse_subsample]
    c_seg = seg_pts[::coarse_seg_stride]
    c_seg_nrm = seg_nrm[::coarse_seg_stride]
    c_seg_prob = seg_prob[::coarse_seg_stride]
    c_seg_mask = seg_mask[::coarse_seg_stride]
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
        c_seg, c_seg_nrm, c_seg_prob, c_seg_mask,
        delta=delta, normal_gate_deg=normal_gate_deg,
        weighted=coarse_weighted, use_pallas=use_pallas,
        matmul_precision=coarse_precision,
    )

    # Stage 2: top-k survivors get batched ICP refinement. On TPU the
    # segment-stationary Pallas kernel (ops/icp.py _icp_corr_kernel_segside)
    # keeps the whole [Ns, Nm] correspondence block in VMEM and ships only
    # the 6x6 normal equations per hypothesis per iteration; it needs the
    # whole model in one VMEM block (Spad * Nm <= 1M f32 x2 live blocks),
    # which every production shape satisfies - beyond that, fall back to the
    # XLA formulation (bandwidth-bound but tiled). With per-iteration
    # correspondences nearly free on the Pallas path, nn_refresh only
    # applies to the XLA fallback.
    if coarse_topk_approx:
        _, idx = jax.lax.approx_max_k(coarse, k, recall_target=0.95)
    else:
        _, idx = jax.lax.top_k(coarse, k)
    top_tfs = transforms[idx]
    icp_pts = model_search_pts[::icp_subsample]
    icp_nrm = model_search_nrm[::icp_subsample]
    i_seg = seg_pts[::icp_seg_stride]
    i_mask = seg_mask[::icp_seg_stride]
    ns_pad = i_seg.shape[0] + (-i_seg.shape[0]) % 128
    nm_pad = icp_pts.shape[0] + (-icp_pts.shape[0]) % 128
    pallas_icp = (
        (use_pallas if use_pallas is not None else jax.default_backend() == "tpu")
        and ns_pad * nm_pad <= (1 << 20)
    )
    if pallas_icp:
        refined = icp_mod.refine_icp_pallas_segside(
            top_tfs, icp_pts, icp_nrm, i_seg, i_mask,
            iters=icp_iters, matmul_precision=icp_precision,
        )
    else:
        refined = icp_mod.refine_icp(
            top_tfs, icp_pts, icp_nrm, i_seg, i_mask,
            iters=icp_iters, point_to_plane=True, nn_refresh=icp_nn_refresh,
        )

    # Stage 3: full-resolution weighted LCP on the refined survivors.
    exact_tier = bool(fine_exact_k) and fine_precision not in (None, "highest")
    if fine_seg_stride > 1 and not exact_tier:
        raise ValueError(
            "fine_seg_stride > 1 requires the exact rescore tier "
            "(fine_exact_k > 0 with a lowered fine_precision); without it "
            "the bulk fine tier is the final score and striding it would "
            "silently change reported scores"
        )
    fine = lcp_mod.lcp_scores(
        refined, model_validation_pts, model_validation_nrm,
        seg_pts[::fine_seg_stride], seg_nrm[::fine_seg_stride],
        seg_prob[::fine_seg_stride], seg_mask[::fine_seg_stride],
        delta=delta, normal_gate_deg=normal_gate_deg,
        weighted=True, use_pallas=use_pallas,
        matmul_precision=fine_precision,
        hb_lane_pack=fine_hb_lane_pack,
    )
    if exact_tier:
        # Two-tier fine: the bulk rescoring ran at lowered matmul precision
        # ("default" = 1 bf16 MXU pass, "high" = 3); the top fine_exact_k
        # survivors (>= what the product consumes) get an exact fp32 rescore
        # so the reported winners carry exact scores. When fine_precision is
        # already exact (None/"highest") the rescore would recompute identical
        # scores, so it is skipped - fine_exact_k is a no-op there by design.
        _, idx_e = jax.lax.top_k(fine, min(fine_exact_k, k))
        exact = lcp_mod.lcp_scores(
            refined[idx_e], model_validation_pts, model_validation_nrm,
            seg_pts, seg_nrm, seg_prob, seg_mask,
            delta=delta, normal_gate_deg=normal_gate_deg,
            weighted=True, use_pallas=use_pallas,
            matmul_precision=exact_precision,
        )
        fine = fine.at[idx_e].set(exact)
    order = jnp.argsort(-fine)
    return ScoredHypotheses(
        top_transforms=refined[order],
        top_scores=fine[order],
        coarse_scores=coarse,
    )
