"""Hypothesis generation: the fused StoCS pipeline for one object.

Reference flow (CongruentSetMatching::generate + Perform_N_steps,
ObjectPoseCandidateSet.cpp:23-70, match4pcsBase.cc:1822-1925): sample 100
bases, extract congruent sets per base (<=100 each), fit a rigid transform
per congruent quad, score every transform with weighted LCP, keep the best
and the improving-prefix set.

TPU design: one jitted function runs base sampling, congruent extraction,
B*Q rigid fits and H-way LCP scoring as a single device program — no disk
round-trips (the reference exchanges PLY files with its .so,
ObjectPoseCandidateSet.cpp:53-68), no per-base loops on the host.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.models.objectdb import ObjectModel
from physimglobalpose_tpu.ops import congruent, lcp, ppf
from physimglobalpose_tpu.ops import sampling
from physimglobalpose_tpu.pipeline.segmentation import Segment3D


class HypothesisResult(NamedTuple):
    transforms: jnp.ndarray  # [H, 4, 4]
    scores: jnp.ndarray  # [H] weighted LCP (0 for invalid)
    valid: jnp.ndarray  # [H] bool
    best_transform: jnp.ndarray  # [4, 4]
    best_score: jnp.ndarray  # []
    enough_points: jnp.ndarray  # [] bool - segment had >= 30 points


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_bases", "use_pallas", "mode"),
)
def generate_hypotheses(
    key: jax.Array,
    seg: Segment3D,
    model_search_pts: jnp.ndarray,  # [Nm, 3] (padded)
    model_search_mask: jnp.ndarray,  # [Nm]
    table: ppf.PPFTable,
    model_validation_pts: jnp.ndarray,  # [Nv, 3]
    model_validation_nrm: jnp.ndarray,  # [Nv, 3]
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_bases: int | None = None,
    use_pallas: bool | None = None,
    mode: str = "stocs",
) -> HypothesisResult:
    """Full congruent-set generation + LCP verification for one object segment.

    mode="stocs" (default): segmentation-prior weighted bases + PPF-table
    pair lists (the reference's operMode 1). mode="super4pcs": uniform bases
    + geometric distance pair extraction (operMode 0). mode="v4pcs":
    tetrahedron bases matched on all six pairwise distances (operMode 2,
    match4pcsBase.cc:978-1044 - inactive in the reference).
    """
    st = cfg.stocs
    b = num_bases or st.num_bases
    k_base, k_quad = jax.random.split(key)

    # Degenerate-segment bail (ObjectPoseCandidateSet.cpp:34-37: <= 30 pts ->
    # identity pose). We still run the kernels (static shapes) but zero the
    # validity so the caller falls back to identity.
    enough = jnp.sum(seg.mask) > cfg.preprocess.min_segment_points

    if mode == "stocs":
        bases = sampling.sample_bases(
            k_base,
            seg.pts,
            seg.nrm,
            seg.prob,
            seg.mask,
            table,
            num_bases=b,
            min_base_angle_deg=st.min_base_angle_deg,
            coplanarity_threshold=st.coplanarity_threshold,
            min_point_spacing=st.min_point_spacing,
        )
        quads, quads_valid = congruent.extract_congruent_quads(
            bases,
            seg.pts,
            seg.nrm,
            model_search_pts,
            table,
            k_quad,
            max_pairs=st.max_pairs_per_ppf,
            max_quads_per_base=st.max_quads_per_base,
            dist_threshold=st.distance_factor * st.delta,
        )
    elif mode == "super4pcs":
        bases = sampling.sample_bases_uniform(
            k_base, seg.pts, seg.mask, num_bases=b,
            min_spread=st.min_point_spacing,
        )
        quads, quads_valid = congruent.extract_congruent_quads_classic(
            bases,
            seg.pts,
            model_search_pts,
            model_search_mask,
            k_quad,
            max_pairs=st.max_pairs_per_ppf,
            max_quads_per_base=st.max_quads_per_base,
            dist_threshold=st.distance_factor * st.delta,
        )
    elif mode == "v4pcs":
        bases = sampling.sample_bases_uniform(
            k_base, seg.pts, seg.mask, num_bases=b,
            min_spread=st.min_point_spacing,
        )
        quads, quads_valid = congruent.extract_congruent_quads_tetra(
            bases,
            seg.pts,
            model_search_pts,
            model_search_mask,
            k_quad,
            max_pairs=st.max_pairs_per_ppf,
            max_quads_per_base=st.max_quads_per_base,
            dist_threshold=st.distance_factor * st.delta,
        )
    else:
        raise ValueError(f"unknown generation mode {mode!r}")
    # Congruent pairs referencing padded model rows are invalid.
    quad_rows_ok = jnp.all(model_search_mask[quads], axis=-1)
    quads_valid = quads_valid & quad_rows_ok

    hyps = congruent.hypotheses_from_quads(
        bases, quads, quads_valid, seg.pts, model_search_pts
    )

    scores = lcp.lcp_scores(
        hyps.transforms,
        model_validation_pts,
        model_validation_nrm,
        seg.pts,
        seg.nrm,
        seg.prob,
        seg.mask,
        delta=cfg.lcp.delta,
        normal_gate_deg=cfg.lcp.normal_gate_deg,
        weighted=True,
        use_pallas=use_pallas,
    )
    valid = hyps.valid & enough
    scores = jnp.where(valid, scores, 0.0)
    best = jnp.argmax(scores)
    best_score = scores[best]
    best_tf = jnp.where(best_score > 0, hyps.transforms[best], jnp.eye(4))
    return HypothesisResult(
        transforms=hyps.transforms,
        scores=scores,
        valid=valid,
        best_transform=best_tf,
        best_score=best_score,
        enough_points=enough,
    )


def top_k_hypotheses(result: HypothesisResult, k: int):
    """The k best-scoring hypotheses (the MCTS branching set).

    Replaces the reference's improving-prefix bookkeeping
    (match4pcsBase.cc:1885-1914) with an explicit top-k — a superset of the
    improving prefix, and deterministic.
    """
    scores, idx = jax.lax.top_k(result.scores, k)
    return result.transforms[idx], scores


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def generate_hypotheses_voting(
    key: jax.Array,
    seg: Segment3D,
    model_search_pts: jnp.ndarray,
    model_search_nrm: jnp.ndarray,
    model_search_mask: jnp.ndarray,
    table: ppf.PPFTable,
    model_validation_pts: jnp.ndarray,
    model_validation_nrm: jnp.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    use_pallas: bool | None = None,
) -> HypothesisResult:
    """PPF Hough-voting generation + LCP verification.

    The working realization of the reference's PPFVoting strategy
    (ObjectPoseCandidateSet.cpp:108-115 stub; inactive Hough machinery
    match4pcsBase.cc:1062-1409) - see ops/ppf_voting.py.
    """
    from physimglobalpose_tpu.ops import ppf_voting

    enough = jnp.sum(seg.mask) > cfg.preprocess.min_segment_points
    res = ppf_voting.ppf_vote(
        key,
        seg.pts, seg.nrm, seg.mask,
        model_search_pts, model_search_nrm, model_search_mask,
        table,
        n_ref=64,
        max_pairs=32,
        top_poses=min(cfg.stocs.max_hypotheses, 256),
    )
    scores = lcp.lcp_scores(
        res.transforms,
        model_validation_pts,
        model_validation_nrm,
        seg.pts,
        seg.nrm,
        seg.prob,
        seg.mask,
        delta=cfg.lcp.delta,
        normal_gate_deg=cfg.lcp.normal_gate_deg,
        weighted=True,
        use_pallas=use_pallas,
    )
    valid = res.valid & enough
    scores = jnp.where(valid, scores, 0.0)
    best = jnp.argmax(scores)
    best_score = scores[best]
    best_tf = jnp.where(best_score > 0, res.transforms[best], jnp.eye(4))
    return HypothesisResult(
        transforms=res.transforms,
        scores=scores,
        valid=valid,
        best_transform=best_tf,
        best_score=best_score,
        enough_points=enough,
    )


def stack_object_tables(tables: list[ppf.PPFTable]) -> ppf.PPFTable:
    """Stack per-object PPF tables into batched arrays (pairs padded).

    All tables share the bin-space shape (same discretization); the variable-
    length pair arrays pad to the max so the whole object set can run as one
    vmapped device program.
    """
    import numpy as np

    p_max = max(int(t.pairs.shape[0]) for t in tables)
    presence = jnp.stack([t.presence for t in tables])
    offsets = jnp.stack([t.offsets for t in tables])
    counts = jnp.stack([t.counts for t in tables])
    pairs = jnp.stack(
        [
            jnp.concatenate(
                [t.pairs, jnp.zeros((p_max - t.pairs.shape[0], 2), jnp.int32)], axis=0
            )
            for t in tables
        ]
    )
    t0 = tables[0]
    return ppf.PPFTable(
        presence=presence, offsets=offsets, counts=counts, pairs=pairs,
        trans_disc=t0.trans_disc, rot_disc=t0.rot_disc, max_dist_mm=t0.max_dist_mm,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_bases", "use_pallas", "mode")
)
def generate_hypotheses_batch(
    key: jax.Array,
    segs: Segment3D,  # leaves stacked with a leading object axis [K, ...]
    model_search_pts: jnp.ndarray,  # [K, Nm, 3]
    model_search_mask: jnp.ndarray,  # [K, Nm]
    tables: ppf.PPFTable,  # stacked (stack_object_tables)
    model_validation_pts: jnp.ndarray,  # [K, Nv, 3]
    model_validation_nrm: jnp.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_bases: int | None = None,
    use_pallas: bool | None = None,
    mode: str = "stocs",
) -> HypothesisResult:
    """All K objects' StoCS generation + verification in ONE device program.

    The data-parallel axis of this workload: the reference runs objects
    serially (SceneCfg.cpp:376-406, threads commented out); here they vmap.
    """
    k = model_search_pts.shape[0]
    keys = jax.random.split(key, k)

    def one(key_i, seg_i, msp, msm, presence, offsets, counts, pairs, mvp, mvn):
        table_i = ppf.PPFTable(
            presence=presence, offsets=offsets, counts=counts, pairs=pairs,
            trans_disc=tables.trans_disc, rot_disc=tables.rot_disc,
            max_dist_mm=tables.max_dist_mm,
        )
        return generate_hypotheses.__wrapped__(
            key_i, seg_i, msp, msm, table_i, mvp, mvn, cfg,
            num_bases=num_bases, use_pallas=use_pallas, mode=mode,
        )

    return jax.vmap(one)(
        keys, segs,
        model_search_pts, model_search_mask,
        tables.presence, tables.offsets, tables.counts, tables.pairs,
        model_validation_pts, model_validation_nrm,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_bases", "use_pallas", "mode")
)
def generate_hypotheses_jobs(
    keys: jax.Array,  # [J] PRNG keys, one per (scene, object) job
    segs: Segment3D,  # leaves stacked with a leading job axis [J, ...]
    model_search_pts: jnp.ndarray,  # [J, Nm, 3]
    model_search_mask: jnp.ndarray,  # [J, Nm]
    tables: ppf.PPFTable,  # stacked with leading job axis
    model_validation_pts: jnp.ndarray,  # [J, Nv, 3]
    model_validation_nrm: jnp.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    num_bases: int | None = None,
    use_pallas: bool | None = None,
    mode: str = "stocs",
) -> HypothesisResult:
    """Flat (scene, object) job batch with EXPLICIT per-job keys.

    The scene-sweep data-parallel path (parallel/scene_sweep.py) flattens
    jobs from many scenes into one leading axis and shards it over the mesh;
    explicit keys let each job reproduce exactly the key it would get from
    the per-scene generate_hypotheses_batch split, so sharded-sweep results
    are bit-comparable to the serial path.
    """

    def one(key_i, seg_i, msp, msm, presence, offsets, counts, pairs, mvp, mvn):
        table_i = ppf.PPFTable(
            presence=presence, offsets=offsets, counts=counts, pairs=pairs,
            trans_disc=tables.trans_disc, rot_disc=tables.rot_disc,
            max_dist_mm=tables.max_dist_mm,
        )
        return generate_hypotheses.__wrapped__(
            key_i, seg_i, msp, msm, table_i, mvp, mvn, cfg,
            num_bases=num_bases, use_pallas=use_pallas, mode=mode,
        )

    return jax.vmap(one)(
        keys, segs,
        model_search_pts, model_search_mask,
        tables.presence, tables.offsets, tables.counts, tables.pairs,
        model_validation_pts, model_validation_nrm,
    )
