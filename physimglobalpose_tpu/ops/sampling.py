"""StoCS weighted base sampling — all bases drawn in parallel.

Reference semantics (SelectQuadrilateralStoCS, match4pcsBase.cc:600-792):
four sequential categorical draws over the segment points; after each draw
the per-point weight is multiplied by an "edge factor" — 1 iff the PPF of
(previous pick, candidate) exists in the model's PPF table, else 0 — so every
picked point is pairwise PPF-compatible with the model. Draw 3 additionally
gates on the inner angle at the base (>= 30 deg), draw 4 on near-coplanarity
and a 1 cm minimum spacing. The reference loops serially until 100 valid
bases accumulate (Perform_N_steps, match4pcsBase.cc:1830-1845).

TPU design: B bases are drawn simultaneously. Each of the 4 draws is a
batched Gumbel-argmax categorical over [B, N] weights; edge factors for all
(picked, candidate) combinations come from one vectorized PPF-bin + presence
lookup. Bases whose weight row collapses to zero are flagged invalid rather
than re-drawn (callers oversample B; invalid bases yield no hypotheses).

Two deliberate fixes over the reference (documented deviations):
- the inner-angle gate normalizes the vectors before acos (the reference
  feeds raw dot products to acos, neutralizing its own gate);
- coplanarity uses true point-plane distance (the reference's Ax+By+Cz=1
  form degenerates when the base plane passes near the centered origin).
"""

from __future__ import annotations

from typing import NamedTuple

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp

from physimglobalpose_tpu.ops import ppf as ppf_mod
from physimglobalpose_tpu.ops import rigid_fit


class BaseSet(NamedTuple):
    indices: jnp.ndarray  # [B, 4] int32 into the segment, TryQuadrilateral order
    invariant1: jnp.ndarray  # [B]
    invariant2: jnp.ndarray  # [B]
    valid: jnp.ndarray  # [B] bool


def _categorical_rows(key: jax.Array, log_w: jnp.ndarray) -> jnp.ndarray:
    """One categorical draw per row of [B, N] log-weights (Gumbel-argmax)."""
    g = jax.random.gumbel(key, log_w.shape)
    return jnp.argmax(log_w + g, axis=-1).astype(jnp.int32)


def sample_bases(
    key: jax.Array,
    seg_pts: jnp.ndarray,
    seg_nrm: jnp.ndarray,
    seg_prob: jnp.ndarray,
    seg_mask: jnp.ndarray,
    table: ppf_mod.PPFTable,
    num_bases: int,
    min_base_angle_deg: float = 30.0,
    coplanarity_threshold: float = 0.01,
    min_point_spacing: float = 0.01,
) -> BaseSet:
    """Draw num_bases 4-point StoCS bases in parallel.

    Args:
      seg_pts/seg_nrm: [N, 3]; seg_prob/seg_mask: [N].
      table: model PPF table (edge factors).
    """
    n = seg_pts.shape[0]
    b = num_bases
    neg_inf = jnp.float32(-1e30)

    base_w = jnp.where(seg_mask & (seg_prob > 0), seg_prob, 0.0)  # [N]
    log0 = jnp.where(base_w > 0, jnp.log(jnp.maximum(base_w, 1e-30)), neg_inf)

    k1, k2, k3, k4 = jax.random.split(key, 4)

    def edge_log(prev_idx: jnp.ndarray) -> jnp.ndarray:
        """log edge factor [B, N]: 0 where PPF(prev, i) present, -inf else."""
        p_prev = seg_pts[prev_idx][:, None, :]  # [B, 1, 3]
        n_prev = seg_nrm[prev_idx][:, None, :]
        bins = ppf_mod.ppf_bins_jax(
            p_prev,
            n_prev,
            seg_pts[None, :, :],
            seg_nrm[None, :, :],
            table.trans_disc,
            table.rot_disc,
            table.max_dist_mm,
        )  # [B, N]
        present = ppf_mod.lookup_presence(table, bins)
        return jnp.where(present, 0.0, neg_inf)

    # --- draw 1: plain probability-weighted.
    logw1 = jnp.broadcast_to(log0, (b, n))
    b1 = _categorical_rows(k1, logw1)

    # --- draw 2: edge-compatible with b1.
    logw2 = logw1 + edge_log(b1)
    logw2 = logw2.at[jnp.arange(b), b1].set(neg_inf)
    b2 = _categorical_rows(k2, logw2)

    # --- draw 3: edge-compatible with b2, inner angle >= threshold.
    v1 = seg_pts[b2] - seg_pts[b1]  # [B, 3]
    v1u = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-12)
    v2 = seg_pts[None, :, :] - seg_pts[b1][:, None, :]  # [B, N, 3]
    v2u = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-12)
    cosang = jnp.abs(jnp.sum(v1u[:, None, :] * v2u, axis=-1))  # folded angle
    angle_ok = cosang <= jnp.cos(jnp.deg2rad(min_base_angle_deg))
    logw3 = logw2 + edge_log(b2) + jnp.where(angle_ok, 0.0, neg_inf)
    logw3 = logw3.at[jnp.arange(b), b2].set(neg_inf)
    b3 = _categorical_rows(k3, logw3)

    # --- draw 4: edge-compatible with b3, near-coplanar, min spacing.
    p1, p2, p3 = seg_pts[b1], seg_pts[b2], seg_pts[b3]
    nrm = jnp.cross(p2 - p1, p3 - p1)  # [B, 3]
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm_u = nrm / jnp.maximum(nlen, 1e-12)
    plane_ok_possible = nlen[..., 0] > 1e-9
    dist_plane = jnp.abs(
        jnp.sum((seg_pts[None, :, :] - p1[:, None, :]) * nrm_u[:, None, :], axis=-1)
    )  # [B, N]
    coplanar = dist_plane <= coplanarity_threshold
    coplanar = coplanar | ~plane_ok_possible[:, None]  # degenerate: no gate (ref behavior)

    def far_from(pk):
        return (
            jnp.linalg.norm(seg_pts[None, :, :] - pk[:, None, :], axis=-1)
            >= min_point_spacing
        )

    spacing_ok = far_from(p1) & far_from(p2) & far_from(p3)
    logw4 = logw3 + edge_log(b3) + jnp.where(coplanar & spacing_ok, 0.0, neg_inf)
    logw4 = logw4.at[jnp.arange(b), b3].set(neg_inf)
    b4 = _categorical_rows(k4, logw4)

    # Validity: the chosen final weight must be finite at every step.
    take = lambda w, i: jnp.take_along_axis(w, i[:, None], axis=1)[:, 0]
    valid = (
        (take(logw1, b1) > neg_inf / 2)
        & (take(logw2, b2) > neg_inf / 2)
        & (take(logw3, b3) > neg_inf / 2)
        & (take(logw4, b4) > neg_inf / 2)
    )

    raw_idx = jnp.stack([b1, b2, b3, b4], axis=-1)  # [B, 4]
    base_pts = seg_pts[raw_idx]  # [B, 4, 3]
    perm, inv1, inv2 = rigid_fit.try_quadrilateral(base_pts)
    idx = jnp.take_along_axis(raw_idx, perm, axis=-1)
    return BaseSet(indices=idx, invariant1=inv1, invariant2=inv2, valid=valid)


def sample_bases_uniform(
    key: jax.Array,
    seg_pts: jnp.ndarray,
    seg_mask: jnp.ndarray,
    num_bases: int,
    min_spread: float = 0.01,
) -> BaseSet:
    """Classic Super4PCS base selection: uniform random wide 4-point bases.

    The probability-free analogue of the reference's SelectQuadrilateral
    (match4pcsBase.cc:470-577: random triangle maximizing spread + a 4th
    point) - TPU form: draw 4 independent uniform picks per base, require
    distinctness and a minimum pairwise spread, reorder via TryQuadrilateral.
    Bases failing the gates are flagged invalid (callers oversample).
    """
    n = seg_pts.shape[0]
    b = num_bases
    neg_inf = jnp.float32(-1e30)
    logw = jnp.where(seg_mask, 0.0, neg_inf)[None, :].repeat(b, axis=0)
    keys = jax.random.split(key, 4)
    picks = [_categorical_rows(k, logw) for k in keys]
    raw_idx = jnp.stack(picks, axis=-1)  # [B, 4]

    pts = seg_pts[raw_idx]  # [B, 4, 3]
    # Pairwise spread gate + distinctness.
    diff = pts[:, :, None, :] - pts[:, None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)  # [B, 4, 4]
    eye = jnp.eye(4, dtype=bool)[None]
    spread_ok = jnp.all((dist >= min_spread) | eye, axis=(1, 2))
    distinct = (
        (raw_idx[:, 0] != raw_idx[:, 1])
        & (raw_idx[:, 0] != raw_idx[:, 2])
        & (raw_idx[:, 0] != raw_idx[:, 3])
        & (raw_idx[:, 1] != raw_idx[:, 2])
        & (raw_idx[:, 1] != raw_idx[:, 3])
        & (raw_idx[:, 2] != raw_idx[:, 3])
    )
    picked_valid = jnp.all(seg_mask[raw_idx], axis=-1)
    valid = spread_ok & distinct & picked_valid

    perm, inv1, inv2 = rigid_fit.try_quadrilateral(pts)
    idx = jnp.take_along_axis(raw_idx, perm, axis=-1)
    return BaseSet(indices=idx, invariant1=inv1, invariant2=inv2, valid=valid)
