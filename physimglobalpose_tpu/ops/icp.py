"""Batched fixed-iteration ICP: trimmed point-to-point and point-to-plane.

Reference: three serial PCL refiners (utilities.cpp:651-739 - TrimmedICP,
point-to-point, point-to-plane with normals) plus a libpointmatcher config
with 75% trimmed outlier keeping (utilities.cpp:744-838). They run one pose
at a time, post-hoc. Here ICP is a first-class batched stage: H hypotheses
refine simultaneously (vmap), each iteration one matmul-NN + one closed-form
update - no trees, no dynamic loops (fixed iteration count, masked
correspondences).

Correspondences run segment -> transformed model (every observed point has a
true correspondence on the model under partial occlusion; the reverse
direction does not), with trimming to the best trim_fraction of matches,
mirroring the reference's trimmed-ICP ratio semantics.
"""

from __future__ import annotations

import functools

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp


def _nn_model(seg_pts, seg_mask, tm_pts):
    """For each segment point: (nn index into model, sq distance)."""
    d2 = (
        jnp.sum(seg_pts * seg_pts, axis=-1)[:, None]
        + jnp.sum(tm_pts * tm_pts, axis=-1)[None, :]
        - 2.0 * seg_pts @ tm_pts.T
    )  # [Ns, Nm]
    nn = jnp.argmin(d2, axis=-1)
    mind2 = jnp.take_along_axis(d2, nn[:, None], axis=-1)[:, 0]
    mind2 = jnp.where(seg_mask, mind2, jnp.inf)
    return nn, mind2


def _trim_weights(mind2, seg_mask, trim_fraction, max_corr_dist):
    """Weight 1 for the best trim_fraction of in-range correspondences."""
    ns = mind2.shape[0]
    in_range = seg_mask & (mind2 <= max_corr_dist * max_corr_dist)
    n_valid = jnp.sum(in_range)
    n_keep = jnp.maximum((n_valid * trim_fraction).astype(jnp.int32), 3)
    d_sorted = jnp.sort(jnp.where(in_range, mind2, jnp.inf))
    kth = d_sorted[jnp.clip(n_keep - 1, 0, ns - 1)]
    return (in_range & (mind2 <= kth)).astype(jnp.float32)


def _robust_weights(mind2, seg_mask, max_corr_dist):
    """Sort-free outlier downweighting: Welsch kernel at scale max_corr_dist/2.

    The TPU-fast replacement for exact trimming - a per-hypothesis quantile
    needs a [Ns] sort every iteration (~82M sorted elements per bench batch),
    while the soft kernel is one exp. Same role as trimming: distant
    correspondences contribute ~nothing to the solve.
    """
    sigma2 = (max_corr_dist * 0.5) ** 2
    in_range = seg_mask & (mind2 <= max_corr_dist * max_corr_dist)
    return jnp.where(in_range, jnp.exp(-mind2 / (2.0 * sigma2)), 0.0)


def _solve_point_to_point(p, q, w):
    """Weighted Kabsch: find (R, t) minimizing sum w |R p + t - q|^2.

    p: model points [N, 3], q: segment points [N, 3], w: [N].
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    pc = jnp.sum(p * w[:, None], axis=0) / wsum
    qc = jnp.sum(q * w[:, None], axis=0) / wsum
    x = (p - pc) * w[:, None]
    y = q - qc
    h = x.T @ y  # [3, 3]
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
    diag = diag.at[2, 2].set(d)
    rot = vt.T @ diag @ u.T
    t = qc - rot @ pc
    return rot, t


def _solve_point_to_plane(p, q, n, w):
    """Linearized point-to-plane: minimize sum w ((p + omega x p + t - q).n)^2.

    Returns (R, t) from the small-angle solution (omega -> rotation matrix via
    Rodrigues).
    """
    r = jnp.sum((p - q) * n, axis=-1)  # [N]
    c = jnp.cross(p, n)  # [N, 3]
    jac = jnp.concatenate([c, n], axis=-1)  # [N, 6]
    a = (jac * w[:, None]).T @ jac + 1e-8 * jnp.eye(6)
    b = -(jac * w[:, None]).T @ r
    x = jnp.linalg.solve(a, b)
    omega, t = x[:3], x[3:]
    theta = jnp.linalg.norm(omega)
    k = omega / jnp.maximum(theta, 1e-12)
    kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    rot = (
        jnp.eye(3)
        + jnp.sin(theta) * kx
        + (1.0 - jnp.cos(theta)) * (kx @ kx)
    )
    return rot, t


def _icp_single(
    transform,
    model_pts,
    model_nrm,
    seg_pts,
    seg_mask,
    iters,
    trim_fraction,
    max_corr_dist,
    point_to_plane,
    exact_trim=False,
):
    def body(_, tf):
        rot, t = tf[:3, :3], tf[:3, 3]
        tm = model_pts @ rot.T + t  # transformed model
        tn = model_nrm @ rot.T
        # NN + correspondence extraction as matmuls (gathers are slow on
        # TPU): a row-normalized argmin one-hot matrix pulls the matched
        # point/normal via [Ns, Nm] @ [Nm, 3] (MXU), ties averaged.
        d2 = (
            jnp.sum(seg_pts * seg_pts, axis=-1)[:, None]
            + jnp.sum(tm * tm, axis=-1)[None, :]
            - 2.0 * seg_pts @ tm.T
        )  # [Ns, Nm]
        mind2 = jnp.min(d2, axis=-1)
        onehot = (d2 <= mind2[:, None]).astype(jnp.float32)
        onehot = onehot / jnp.maximum(jnp.sum(onehot, axis=-1, keepdims=True), 1.0)
        p = onehot @ tm  # matched (already-transformed) model points [Ns, 3]
        n = onehot @ tn
        mind2 = jnp.where(seg_mask, mind2, jnp.inf)
        if exact_trim:
            w = _trim_weights(mind2, seg_mask, trim_fraction, max_corr_dist)
        else:
            w = _robust_weights(mind2, seg_mask, max_corr_dist)
        if point_to_plane:
            drot, dt = _solve_point_to_plane(p, seg_pts, n, w)
        else:
            drot, dt = _solve_point_to_point(p, seg_pts, w)
        new_rot = drot @ rot
        new_t = drot @ t + dt
        out = jnp.eye(4)
        out = out.at[:3, :3].set(new_rot).at[:3, 3].set(new_t)
        return out

    return jax.lax.fori_loop(0, iters, body, transform)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "trim_fraction", "max_corr_dist", "point_to_plane", "h_chunk",
        "exact_trim",
    ),
)
def refine_icp(
    transforms: jnp.ndarray,  # [H, 4, 4]
    model_pts: jnp.ndarray,  # [Nm, 3]
    model_nrm: jnp.ndarray,  # [Nm, 3]
    seg_pts: jnp.ndarray,  # [Ns, 3]
    seg_mask: jnp.ndarray,  # [Ns]
    iters: int = 20,
    trim_fraction: float = 0.8,
    max_corr_dist: float = 0.02,
    point_to_plane: bool = True,
    h_chunk: int = 64,
    exact_trim: bool = False,
) -> jnp.ndarray:
    """Refine H poses in parallel; returns [H, 4, 4].

    The hypothesis batch runs in chunks of h_chunk: the vmapped NN distance
    block is [h_chunk, Ns, Nm] (a full vmap over H would materialize an
    [H, Ns, Nm] tensor - 34 GB at H=8k, 1k-point clouds).
    """
    fn = functools.partial(
        _icp_single,
        model_pts=model_pts,
        model_nrm=model_nrm,
        seg_pts=seg_pts,
        seg_mask=seg_mask,
        iters=iters,
        trim_fraction=trim_fraction,
        max_corr_dist=max_corr_dist,
        point_to_plane=point_to_plane,
        exact_trim=exact_trim,
    )
    h = transforms.shape[0]
    if h <= h_chunk:
        return jax.vmap(fn)(transforms)
    pad = (-h) % h_chunk
    tfs = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad, 4, 4))], axis=0
    ).reshape(-1, h_chunk, 4, 4)
    out = jax.lax.map(jax.vmap(fn), tfs).reshape(-1, 4, 4)
    return out[:h]


def icp_fitness(
    transforms: jnp.ndarray,
    model_pts: jnp.ndarray,
    seg_pts: jnp.ndarray,
    seg_mask: jnp.ndarray,
    inlier_dist: float = 0.01,
) -> jnp.ndarray:
    """Fraction of segment points within inlier_dist of the transformed model."""

    def one(tf):
        tm = model_pts @ tf[:3, :3].T + tf[:3, 3]
        _, mind2 = _nn_model(seg_pts, seg_mask, tm)
        ok = seg_mask & (mind2 <= inlier_dist * inlier_dist)
        return jnp.sum(ok) / jnp.maximum(jnp.sum(seg_mask), 1)

    return jax.vmap(one)(transforms)
