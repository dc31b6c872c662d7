"""PPF (Drost-style) Hough voting pose generation.

Reference status: PPFVoting::generate is a stub (its core call commented
out, ObjectPoseCandidateSet.cpp:113) and the Hough machinery in the fork
(computeTransformRT / computeAlpha / Perform_Hough_Voting,
match4pcsBase.cc:1062-1409,1804-1820) is present but inactive. This module
provides a *working* TPU-native implementation of that pathway.

Algorithm (Drost et al. CVPR'10, the scheme the reference's code follows):
for every scene reference point s_r, every other scene point s_i forms a
PPF; the model's pair list for that PPF bin proposes (m_r, m_i)
correspondences. Each correspondence votes for (m_r, alpha) where alpha is
the roll angle about the aligned normal axis. Peaks of the vote table yield
poses T = T_s^-1 . Rx(alpha) . T_m.

TPU design: the vote table [n_ref, n_model, n_alpha] is a dense scatter-add;
all reference points, partners, and candidate pairs vote in one batched
kernel - no hash maps, no serial accumulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp

from physimglobalpose_tpu.ops import ppf as ppf_mod


def canonical_frame(p: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """SE(3) transform T with T(p) = 0 and T's rotation mapping n -> +x.

    (computeTransformRT semantics: align the reference point and its normal
    to the canonical x-axis frame.)
    Inputs [..., 3]; returns [..., 4, 4].
    """
    ex = jnp.array([1.0, 0.0, 0.0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    axis = jnp.cross(n, jnp.broadcast_to(ex, n.shape))
    s = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    c = jnp.sum(n * ex, axis=-1, keepdims=True)
    axis_u = axis / jnp.maximum(s, 1e-12)
    # Rodrigues; degenerate (n ~ +-x) handled via fallback axes.
    k = axis_u
    kx = jnp.stack(
        [
            jnp.zeros_like(k[..., 0]), -k[..., 2], k[..., 1],
            k[..., 2], jnp.zeros_like(k[..., 0]), -k[..., 0],
            -k[..., 1], k[..., 0], jnp.zeros_like(k[..., 0]),
        ],
        axis=-1,
    ).reshape(k.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3), kx.shape)
    rot = eye + s[..., None] * kx + (1 - c[..., None]) * (kx @ kx)
    # n == +x -> identity; n == -x -> 180 deg about z.
    flip = jnp.broadcast_to(
        jnp.array([[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]]), kx.shape
    )
    degenerate = s[..., 0] < 1e-6
    rot = jnp.where(
        degenerate[..., None, None], jnp.where(c[..., None] > 0, eye, flip), rot
    )
    t = -jnp.einsum("...ij,...j->...i", rot, p)
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def _alpha_of(frame: jnp.ndarray, partner: jnp.ndarray) -> jnp.ndarray:
    """Roll angle of a partner point in the canonical frame (about +x)."""
    local = (
        jnp.einsum("...ij,...j->...i", frame[..., :3, :3], partner)
        + frame[..., :3, 3]
    )
    return jnp.arctan2(local[..., 2], local[..., 1])


class VoteResult(NamedTuple):
    transforms: jnp.ndarray  # [P, 4, 4] candidate poses (model -> scene)
    votes: jnp.ndarray  # [P] vote counts
    valid: jnp.ndarray  # [P]


@functools.partial(
    jax.jit,
    static_argnames=("n_ref", "max_pairs", "n_alpha", "top_poses"),
)
def ppf_vote(
    key: jax.Array,
    seg_pts: jnp.ndarray,  # [Ns, 3]
    seg_nrm: jnp.ndarray,
    seg_mask: jnp.ndarray,
    model_pts: jnp.ndarray,  # [Nm, 3]
    model_nrm: jnp.ndarray,
    model_mask: jnp.ndarray,
    table: ppf_mod.PPFTable,
    n_ref: int = 64,
    max_pairs: int = 32,
    n_alpha: int = 32,
    top_poses: int = 64,
) -> VoteResult:
    """Run PPF voting; returns the top-voted candidate poses."""
    ns = seg_pts.shape[0]
    nm = model_pts.shape[0]

    k_ref = jax.random.split(key, 1)[0]
    # Choose reference points uniformly among valid segment points.
    logw = jnp.where(seg_mask, 0.0, -1e30)
    g = jax.random.gumbel(k_ref, (n_ref, ns))
    ref_idx = jnp.argmax(logw[None, :] + g, axis=-1)  # [R]

    ref_p = seg_pts[ref_idx]  # [R, 3]
    ref_n = seg_nrm[ref_idx]
    ref_frame = canonical_frame(ref_p, ref_n)  # [R, 4, 4]

    # PPFs between each reference point and every scene partner.
    bins = ppf_mod.ppf_bins_jax(
        ref_p[:, None, :], ref_n[:, None, :],
        seg_pts[None, :, :], seg_nrm[None, :, :],
        table.trans_disc, table.rot_disc, table.max_dist_mm,
    )  # [R, Ns]

    gather = jax.vmap(jax.vmap(lambda fb: ppf_mod.gather_pairs(table, fb, max_pairs)))
    pairs, pmask = gather(bins)  # [R, Ns, K, 2], [R, Ns, K]
    pmask = pmask & seg_mask[None, :, None]
    # Partner must not be the reference itself.
    partner_ok = jnp.arange(ns)[None, :] != ref_idx[:, None]
    pmask = pmask & partner_ok[:, :, None]

    # Scene-side roll angle per (ref, partner).
    alpha_s = _alpha_of(ref_frame[:, None, :, :], seg_pts[None, :, :])  # [R, Ns]

    # Model-side: canonical frame per candidate m_r, roll of m_i within it.
    m_r = pairs[..., 0]  # [R, Ns, K]
    m_i = pairs[..., 1]
    mr_frame = canonical_frame(model_pts[m_r], model_nrm[m_r])  # [R, Ns, K, 4, 4]
    alpha_m = _alpha_of(mr_frame, model_pts[m_i])  # [R, Ns, K]

    alpha = alpha_s[:, :, None] - alpha_m  # [R, Ns, K]
    abin = jnp.mod(
        jnp.floor((alpha + jnp.pi) / (2 * jnp.pi) * n_alpha).astype(jnp.int32),
        n_alpha,
    )

    # Vote table [R, Nm, n_alpha] via scatter-add on the flat index.
    flat = (jnp.arange(n_ref)[:, None, None] * nm + m_r) * n_alpha + abin
    flat = jnp.where(pmask, flat, n_ref * nm * n_alpha)  # overflow bucket
    votes = jnp.zeros(n_ref * nm * n_alpha + 1, jnp.int32).at[flat.reshape(-1)].add(1)
    votes = votes[:-1].reshape(n_ref, nm, n_alpha)
    # Model padding rows never win.
    votes = jnp.where(model_mask[None, :, None], votes, 0)

    # Top poses across the whole table.
    flat_votes = votes.reshape(-1)
    top_v, top_i = jax.lax.top_k(flat_votes, top_poses)
    r_i = top_i // (nm * n_alpha)
    m_i2 = (top_i // n_alpha) % nm
    a_i = top_i % n_alpha

    alpha_c = (a_i.astype(jnp.float32) + 0.5) / n_alpha * 2 * jnp.pi - jnp.pi
    ca, sa = jnp.cos(alpha_c), jnp.sin(alpha_c)
    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    rx = jnp.stack(
        [ones, zeros, zeros, zeros,
         zeros, ca, -sa, zeros,
         zeros, sa, ca, zeros,
         zeros, zeros, zeros, ones],
        axis=-1,
    ).reshape(-1, 4, 4)

    ts = ref_frame[r_i]  # [P, 4, 4] scene frame
    tm = canonical_frame(model_pts[m_i2], model_nrm[m_i2])
    ts_inv_rot = jnp.swapaxes(ts[:, :3, :3], -1, -2)
    ts_inv_t = -jnp.einsum("pij,pj->pi", ts_inv_rot, ts[:, :3, 3])
    ts_inv = jnp.concatenate(
        [
            jnp.concatenate([ts_inv_rot, ts_inv_t[:, :, None]], axis=-1),
            jnp.broadcast_to(jnp.array([0.0, 0, 0, 1.0]), (ts.shape[0], 1, 4)),
        ],
        axis=-2,
    )
    pose = jnp.einsum("pij,pjk,pkl->pil", ts_inv, rx, tm)
    return VoteResult(transforms=pose, votes=top_v, valid=top_v > 0)
