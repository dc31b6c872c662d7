"""Congruent-set extraction and batched hypothesis construction.

Reference semantics (ExtractCongruentSet, match4pcsBase.cc:1929-2039 StoCS
branch; FindCongruentQuadrilaterals, super4pcs.cc:78-187):
- the two base segments (b1,b2) and (b3,b4) are discretized to PPF bins; the
  model's pair lists for those bins are the candidate pair sets;
- pair list 1 contributes invariant points e1 = q_i + inv1 (q_j - q_i), pair
  list 2 contributes queries e2 = q_k + inv2 (q_l - q_k); a (pair1, pair2)
  combination is congruent when e1 ~ e2 within the distance threshold AND the
  pair directions subtend the same angle as the base segments (the
  IndexedNormalSet cone query, normalset.hpp:168-214);
- at most 100 congruent quads per base are kept (random subsample,
  match4pcsBase.cc:1853-1877); each yields a rigid transform from the first
  three point correspondences (ComputeRigidTransformFromCongruentPair).

TPU design: for B bases at once, the two pair lists are CSR gathers
([B, K, 2] with masks), the K x K compatibility test is a batched outer
comparison ([B, K, K] bools), per-base top-k selects <= Q quads, and all
B*Q rigid fits run as a single batched Gram-Schmidt fit. No trees, no sets.
"""

from __future__ import annotations

from typing import NamedTuple

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp

from physimglobalpose_tpu.ops import ppf as ppf_mod
from physimglobalpose_tpu.ops import rigid_fit
from physimglobalpose_tpu.ops.sampling import BaseSet


class HypothesisSet(NamedTuple):
    transforms: jnp.ndarray  # [H, 4, 4] model->camera poses
    valid: jnp.ndarray  # [H] bool
    base_id: jnp.ndarray  # [H] int32 - which base produced it


def extract_congruent_quads(
    bases: BaseSet,
    seg_pts: jnp.ndarray,
    seg_nrm: jnp.ndarray,
    model_pts: jnp.ndarray,
    table: ppf_mod.PPFTable,
    key: jax.Array,
    max_pairs: int = 256,
    max_quads_per_base: int = 100,
    dist_threshold: float = 0.01,
    angle_cos_eps: float = 0.15,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find congruent model quads for every base.

    Returns:
      quads: [B, Q, 4] int32 model indices (i, j, k, l).
      valid: [B, Q] bool.
    """
    b = bases.indices.shape[0]
    q = max_quads_per_base

    i1, i2, i3, i4 = (bases.indices[:, k] for k in range(4))
    p1, p2, p3, p4 = (seg_pts[i] for i in (i1, i2, i3, i4))
    n1, n2, n3, n4 = (seg_nrm[i] for i in (i1, i2, i3, i4))

    bins1 = ppf_mod.ppf_bins_jax(
        p1, n1, p2, n2, table.trans_disc, table.rot_disc, table.max_dist_mm
    )  # [B]
    bins2 = ppf_mod.ppf_bins_jax(
        p3, n3, p4, n4, table.trans_disc, table.rot_disc, table.max_dist_mm
    )

    gather = jax.vmap(lambda fb: ppf_mod.gather_pairs(table, fb, max_pairs))
    pairs1, m1 = gather(bins1)  # [B, K, 2], [B, K]
    pairs2, m2 = gather(bins2)

    # Invariant points and pair directions in model coordinates.
    qa = model_pts[pairs1[..., 0]]  # [B, K, 3]
    qb = model_pts[pairs1[..., 1]]
    qc = model_pts[pairs2[..., 0]]
    qd = model_pts[pairs2[..., 1]]
    e1 = qa + bases.invariant1[:, None, None] * (qb - qa)
    e2 = qc + bases.invariant2[:, None, None] * (qd - qc)
    d1 = qb - qa
    d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-12)
    d2 = qd - qc
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=-1, keepdims=True), 1e-12)

    # Base angle (cosine) between the two base segment directions.
    bd1 = p2 - p1
    bd1 = bd1 / jnp.maximum(jnp.linalg.norm(bd1, axis=-1, keepdims=True), 1e-12)
    bd2 = p4 - p3
    bd2 = bd2 / jnp.maximum(jnp.linalg.norm(bd2, axis=-1, keepdims=True), 1e-12)
    alpha = jnp.sum(bd1 * bd2, axis=-1)  # [B]

    # [B, K, K] compatibility.
    dist2 = jnp.sum((e1[:, :, None, :] - e2[:, None, :, :]) ** 2, axis=-1)
    dir_cos = jnp.einsum("bkc,bmc->bkm", d1, d2)
    ok = (
        (dist2 <= dist_threshold * dist_threshold)
        & (jnp.abs(dir_cos - alpha[:, None, None]) <= angle_cos_eps)
        & m1[:, :, None]
        & m2[:, None, :]
        & bases.valid[:, None, None]
    )

    # Random subsample of <= Q per base (reference caps at 100, random).
    flat_ok = ok.reshape(b, -1)
    priority = jnp.where(
        flat_ok, jax.random.uniform(key, flat_ok.shape), 2.0
    )
    _, sel = jax.lax.top_k(-priority, q)  # [B, Q] flat indices into K*K
    valid = jnp.take_along_axis(flat_ok, sel, axis=1)
    k1_idx = sel // max_pairs
    k2_idx = sel % max_pairs
    qi = jnp.take_along_axis(pairs1[..., 0], k1_idx, axis=1)
    qj = jnp.take_along_axis(pairs1[..., 1], k1_idx, axis=1)
    qk = jnp.take_along_axis(pairs2[..., 0], k2_idx, axis=1)
    ql = jnp.take_along_axis(pairs2[..., 1], k2_idx, axis=1)
    quads = jnp.stack([qi, qj, qk, ql], axis=-1)  # [B, Q, 4]
    return quads, valid


def hypotheses_from_quads(
    bases: BaseSet,
    quads: jnp.ndarray,
    quads_valid: jnp.ndarray,
    seg_pts: jnp.ndarray,
    model_pts: jnp.ndarray,
) -> HypothesisSet:
    """Rigid transforms for all (base, quad) combinations, flattened.

    Fit uses the first three correspondences
    (base points b1,b2,b3 <- model points i,j,k), as the reference does
    (ComputeRigidTransformation "planar case", match4pcsBase.cc:1521-1523).
    """
    b, q = quads.shape[:2]
    base_tri = seg_pts[bases.indices[:, :3]]  # [B, 3, 3]
    base_tri = jnp.broadcast_to(base_tri[:, None], (b, q, 3, 3)).reshape(-1, 3, 3)
    quad_tri = model_pts[quads[..., :3]].reshape(-1, 3, 3)  # [B*Q, 3, 3]

    tf, rms, ok = rigid_fit.rigid_fit_3pt(base_tri, quad_tri)
    valid = quads_valid.reshape(-1) & ok & (rms >= 0.0)
    base_id = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, q)
    ).reshape(-1)
    return HypothesisSet(transforms=tf, valid=valid, base_id=base_id)


def extract_pairs_by_distance(
    model_pts: jnp.ndarray,
    model_mask: jnp.ndarray,
    dist: jnp.ndarray,
    eps: float,
    key: jax.Array,
    max_pairs: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Geometric pair extraction for classic Super4PCS mode.

    All directed model pairs whose length matches `dist` within eps
    (the brute-force semantics of ExtractPairs, 4pcs.cc:109-193 - the
    hypersphere accelerator is an indexing detail, not a semantic one).
    dist may be batched [B]; returns ([B?, max_pairs, 2], [B?, max_pairs]).
    """
    n = model_pts.shape[0]
    d = jnp.linalg.norm(
        model_pts[:, None, :] - model_pts[None, :, :], axis=-1
    )  # [N, N]
    valid2 = model_mask[:, None] & model_mask[None, :]
    not_self = ~jnp.eye(n, dtype=bool)

    def one(dist_scalar, k):
        ok = valid2 & not_self & (jnp.abs(d - dist_scalar) <= eps)
        flat_ok = ok.reshape(-1)
        priority = jnp.where(flat_ok, jax.random.uniform(k, flat_ok.shape), 2.0)
        _, sel = jax.lax.top_k(-priority, max_pairs)
        mask = flat_ok[sel]
        return jnp.stack([sel // n, sel % n], axis=-1).astype(jnp.int32), mask

    if dist.ndim == 0:
        return one(dist, key)
    keys = jax.random.split(key, dist.shape[0])
    return jax.vmap(one)(dist, keys)


def extract_congruent_quads_classic(
    bases: BaseSet,
    seg_pts: jnp.ndarray,
    model_pts: jnp.ndarray,
    model_mask: jnp.ndarray,
    key: jax.Array,
    max_pairs: int = 256,
    max_quads_per_base: int = 100,
    dist_threshold: float = 0.01,
    angle_cos_eps: float = 0.15,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Congruent-quad extraction with distance-extracted pair lists.

    The classic Super4PCS path (operMode 0): pair sets come from geometric
    distance matching instead of the PPF table (ExtractCongruentSet non-StoCS
    branch, match4pcsBase.cc:1953-1960); the invariant-point matching is
    shared with the StoCS path.
    """
    b = bases.indices.shape[0]
    q = max_quads_per_base
    k_pairs1, k_pairs2, k_sel = jax.random.split(key, 3)

    i1, i2, i3, i4 = (bases.indices[:, k] for k in range(4))
    p1, p2, p3, p4 = (seg_pts[i] for i in (i1, i2, i3, i4))
    d1 = jnp.linalg.norm(p2 - p1, axis=-1)  # [B]
    d2_ = jnp.linalg.norm(p4 - p3, axis=-1)

    pairs1, m1 = extract_pairs_by_distance(
        model_pts, model_mask, d1, dist_threshold, k_pairs1, max_pairs
    )
    pairs2, m2 = extract_pairs_by_distance(
        model_pts, model_mask, d2_, dist_threshold, k_pairs2, max_pairs
    )

    qa = model_pts[pairs1[..., 0]]
    qb = model_pts[pairs1[..., 1]]
    qc = model_pts[pairs2[..., 0]]
    qd = model_pts[pairs2[..., 1]]
    e1 = qa + bases.invariant1[:, None, None] * (qb - qa)
    e2 = qc + bases.invariant2[:, None, None] * (qd - qc)
    dd1 = qb - qa
    dd1 = dd1 / jnp.maximum(jnp.linalg.norm(dd1, axis=-1, keepdims=True), 1e-12)
    dd2 = qd - qc
    dd2 = dd2 / jnp.maximum(jnp.linalg.norm(dd2, axis=-1, keepdims=True), 1e-12)

    bd1 = p2 - p1
    bd1 = bd1 / jnp.maximum(jnp.linalg.norm(bd1, axis=-1, keepdims=True), 1e-12)
    bd2 = p4 - p3
    bd2 = bd2 / jnp.maximum(jnp.linalg.norm(bd2, axis=-1, keepdims=True), 1e-12)
    alpha = jnp.sum(bd1 * bd2, axis=-1)

    dist2 = jnp.sum((e1[:, :, None, :] - e2[:, None, :, :]) ** 2, axis=-1)
    dir_cos = jnp.einsum("bkc,bmc->bkm", dd1, dd2)
    ok = (
        (dist2 <= dist_threshold * dist_threshold)
        & (jnp.abs(dir_cos - alpha[:, None, None]) <= angle_cos_eps)
        & m1[:, :, None]
        & m2[:, None, :]
        & bases.valid[:, None, None]
    )

    flat_ok = ok.reshape(b, -1)
    priority = jnp.where(flat_ok, jax.random.uniform(k_sel, flat_ok.shape), 2.0)
    _, sel = jax.lax.top_k(-priority, q)
    valid = jnp.take_along_axis(flat_ok, sel, axis=1)
    k1_idx = sel // max_pairs
    k2_idx = sel % max_pairs
    qi = jnp.take_along_axis(pairs1[..., 0], k1_idx, axis=1)
    qj = jnp.take_along_axis(pairs1[..., 1], k1_idx, axis=1)
    qk = jnp.take_along_axis(pairs2[..., 0], k2_idx, axis=1)
    ql = jnp.take_along_axis(pairs2[..., 1], k2_idx, axis=1)
    quads = jnp.stack([qi, qj, qk, ql], axis=-1)
    return quads, valid


def extract_congruent_quads_tetra(
    bases: BaseSet,
    seg_pts: jnp.ndarray,
    model_pts: jnp.ndarray,
    model_mask: jnp.ndarray,
    key: jax.Array,
    max_pairs: int = 256,
    max_quads_per_base: int = 100,
    dist_threshold: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """V4PCS tetrahedron congruence (operMode 2): all SIX pairwise base
    distances must match (FindCongruentQuadrilateralsV4PCS,
    match4pcsBase.cc:978-1044 - inactive in the reference, operMode
    hardcoded to 1 at :300; provided here for completeness).

    The reference joins six per-distance pair lists through connectivity
    maps; on TPU the same predicate is a [B, K, K] outer test: pair list 1
    supplies (v1, v2) at base distance d12, pair list 2 supplies (v3, v4)
    at d34, and a combination is congruent when the four cross distances
    (d13, d14, d23, d24) also match within threshold.
    """
    b = bases.indices.shape[0]
    q = max_quads_per_base
    k_pairs1, k_pairs2, k_sel = jax.random.split(key, 3)

    i1, i2, i3, i4 = (bases.indices[:, k] for k in range(4))
    p1, p2, p3, p4 = (seg_pts[i] for i in (i1, i2, i3, i4))
    d12 = jnp.linalg.norm(p2 - p1, axis=-1)  # [B]
    d34 = jnp.linalg.norm(p4 - p3, axis=-1)
    d13 = jnp.linalg.norm(p3 - p1, axis=-1)
    d14 = jnp.linalg.norm(p4 - p1, axis=-1)
    d23 = jnp.linalg.norm(p3 - p2, axis=-1)
    d24 = jnp.linalg.norm(p4 - p2, axis=-1)

    pairs1, m1 = extract_pairs_by_distance(
        model_pts, model_mask, d12, dist_threshold, k_pairs1, max_pairs
    )
    pairs2, m2 = extract_pairs_by_distance(
        model_pts, model_mask, d34, dist_threshold, k_pairs2, max_pairs
    )

    qa = model_pts[pairs1[..., 0]]  # [B, K, 3] candidate v1
    qb = model_pts[pairs1[..., 1]]  # candidate v2
    qc = model_pts[pairs2[..., 0]]  # candidate v3
    qd = model_pts[pairs2[..., 1]]  # candidate v4

    def cross(a_pts, b_pts, dist):
        dd = jnp.linalg.norm(
            a_pts[:, :, None, :] - b_pts[:, None, :, :], axis=-1
        )  # [B, K, K]
        return jnp.abs(dd - dist[:, None, None]) <= dist_threshold

    ok = (
        cross(qa, qc, d13)
        & cross(qa, qd, d14)
        & cross(qb, qc, d23)
        & cross(qb, qd, d24)
        & m1[:, :, None]
        & m2[:, None, :]
        & bases.valid[:, None, None]
    )

    flat_ok = ok.reshape(b, -1)
    priority = jnp.where(flat_ok, jax.random.uniform(k_sel, flat_ok.shape), 2.0)
    _, sel = jax.lax.top_k(-priority, q)
    valid = jnp.take_along_axis(flat_ok, sel, axis=1)
    k1_idx = sel // max_pairs
    k2_idx = sel % max_pairs
    qi = jnp.take_along_axis(pairs1[..., 0], k1_idx, axis=1)
    qj = jnp.take_along_axis(pairs1[..., 1], k1_idx, axis=1)
    qk = jnp.take_along_axis(pairs2[..., 0], k2_idx, axis=1)
    ql = jnp.take_along_axis(pairs2[..., 1], k2_idx, axis=1)
    quads = jnp.stack([qi, qj, qk, ql], axis=-1)
    return quads, valid
