"""Batched base reordering (invariants) and 3-point rigid transform fit.

Reference semantics:
- distSegmentToSegment + TryQuadrilateral (match4pcsBase.cc:76-148, 415-465):
  among the 12 ordered splits of 4 base points into two segments, pick the
  split whose segments pass closest to each other; the parametric coordinates
  of the closest points are the affine invariants (invariant1, invariant2).
- ComputeRigidTransformation (match4pcsBase.cc:1504-1614): align the
  orthonormal frames built by Gram-Schmidt from the first 3 point pairs;
  R = Rp^T Rq; reject non-orthogonal solutions; translation composed as
  T(x) = centroid1 + R (x - centroid2) and de-normalized to original
  coordinates via the cloud centroids (match4pcsBase.cc:1475-1484).

All functions are vmap-ready over a leading batch dimension.
"""

from __future__ import annotations

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax.numpy as jnp


_K_SMALL = 1e-4  # kSmallNumber in distSegmentToSegment (match4pcsBase.cc:87)


def seg_seg_invariants(p1, p2, q1, q2):
    """Closest approach of segments (p1,p2), (q1,q2) -> (dist, inv1, inv2).

    Straight port of the branchy reference routine to jnp.where form
    (match4pcsBase.cc:76-148). Inputs [..., 3].
    """
    u = p2 - p1
    v = q2 - q1
    w = p1 - q1
    a = jnp.sum(u * u, axis=-1)
    b = jnp.sum(u * v, axis=-1)
    c = jnp.sum(v * v, axis=-1)
    d = jnp.sum(u * w, axis=-1)
    e = jnp.sum(v * w, axis=-1)
    f = a * c - b * b

    small = f < _K_SMALL

    # Non-parallel branch initial values.
    s1_np = b * e - c * d
    t1_np = a * e - b * d
    s2_np = f
    t2_np = f
    # s1 < 0 sub-branch
    neg = s1_np < 0.0
    over = s1_np > s2_np
    s1_1 = jnp.where(neg, 0.0, jnp.where(over, s2_np, s1_np))
    t1_1 = jnp.where(neg, e, jnp.where(over, e + b, t1_np))
    t2_1 = jnp.where(neg | over, c, t2_np)
    s2_1 = s2_np

    # Parallel branch values.
    s1 = jnp.where(small, 0.0, s1_1)
    s2 = jnp.where(small, 1.0, s2_1)
    t1 = jnp.where(small, e, t1_1)
    t2 = jnp.where(small, c, t2_1)

    # t clamping (applies in both branches).
    tneg = t1 < 0.0
    tover = t1 > t2
    # t1 < 0 case:
    s1_tn = jnp.where(-d < 0.0, 0.0, jnp.where(-d > a, s2, -d))
    s2_tn = jnp.where(-d < 0.0, s2, jnp.where(-d > a, s2, a))
    # t1 > t2 case:
    db = -d + b
    s1_to = jnp.where(db < 0.0, 0.0, jnp.where(db > a, s2, db))
    s2_to = jnp.where(db < 0.0, s2, jnp.where(db > a, s2, a))

    s1 = jnp.where(tneg, s1_tn, jnp.where(tover, s1_to, s1))
    s2 = jnp.where(tneg, s2_tn, jnp.where(tover, s2_to, s2))
    t1 = jnp.where(tneg, 0.0, jnp.where(tover, t2, t1))

    inv1 = jnp.where(jnp.abs(s1) < _K_SMALL, 0.0, s1 / s2)
    inv2 = jnp.where(jnp.abs(t1) < _K_SMALL, 0.0, t1 / t2)
    dist = jnp.linalg.norm(w + inv1[..., None] * u - inv2[..., None] * v, axis=-1)
    return dist, inv1, inv2


# The 12 ordered splits tried by TryQuadrilateral's nested loops
# (i, j distinct; k = first index not in {i,j}; l = the remaining one).
_SPLITS = []
for _i in range(4):
    for _j in range(4):
        if _i == _j:
            continue
        _k = next(x for x in range(4) if x not in (_i, _j))
        _l = next(x for x in range(4) if x not in (_i, _j, _k))
        _SPLITS.append((_i, _j, _k, _l))
_SPLITS = tuple(_SPLITS)


def try_quadrilateral(base_pts: jnp.ndarray):
    """Reorder a 4-point base for minimum segment crossing distance.

    Args:
      base_pts: [..., 4, 3].
    Returns:
      (perm [..., 4] int32 - reordering into (segment1, segment2) order,
       invariant1 [...], invariant2 [...]).
    """
    splits = jnp.asarray(_SPLITS, dtype=jnp.int32)  # [12, 4]
    p = base_pts[..., splits, :]  # [..., 12, 4, 3]
    dist, inv1, inv2 = seg_seg_invariants(
        p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    )
    best = jnp.argmin(dist, axis=-1)  # [...]
    perm = splits[best]
    take = lambda x: jnp.take_along_axis(x, best[..., None], axis=-1)[..., 0]
    return perm, take(inv1), take(inv2)


def rigid_fit_3pt(
    p: jnp.ndarray,
    q: jnp.ndarray,
    centroid_p_global: jnp.ndarray | None = None,
    centroid_q_global: jnp.ndarray | None = None,
):
    """Rigid transform aligning point triple q -> p (first 3 of each quad).

    Args:
      p: [..., 3, 3] target points (scene base triple).
      q: [..., 3, 3] source points (model congruent triple).
      centroid_p_global / centroid_q_global: optional [..., 3] de-centering
        offsets; when given, the returned transform maps *original* model
        coordinates to *original* scene coordinates (the reference's
        de-normalization, match4pcsBase.cc:1475-1484). When None, operates in
        the given coordinates directly.
    Returns:
      (transform [..., 4, 4], rms [...], ok [...] bool).
    """
    eps = 1e-6
    p0, p1, p2 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    q0, q1, q2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]

    def frame(a0, a1, a2):
        v1 = a1 - a0
        n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
        ok1 = n1[..., 0] > eps
        v1 = v1 / jnp.maximum(n1, eps)
        v2 = (a2 - a0) - jnp.sum((a2 - a0) * v1, axis=-1, keepdims=True) * v1
        n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
        ok2 = n2[..., 0] > eps
        v2 = v2 / jnp.maximum(n2, eps)
        v3 = jnp.cross(v1, v2)
        return jnp.stack([v1, v2, v3], axis=-2), ok1 & ok2  # rows

    rp, okp = frame(p0, p1, p2)
    rq, okq = frame(q0, q1, q2)
    rot = jnp.einsum("...ji,...jk->...ik", rp, rq)  # rp^T @ rq

    # Orthogonality check (match4pcsBase.cc:1564-1566).
    rr = jnp.einsum("...ij,...jk->...ik", rot, rot)
    diag = jnp.stack([rr[..., 0, 0], rr[..., 1, 1], rr[..., 2, 2]], axis=-1)
    ortho_ok = jnp.all(diag - 1.0 <= 1e-5, axis=-1)

    cen_p = (p0 + p1 + p2) / 3.0
    cen_q = (q0 + q1 + q2) / 3.0

    # rms over the 3 pairs (reference divides by pairs.size() == 4).
    qs = jnp.stack([q0, q1, q2], axis=-2) - cen_q[..., None, :]
    ps = jnp.stack([p0, p1, p2], axis=-2) - cen_p[..., None, :]
    moved = jnp.einsum("...ij,...nj->...ni", rot, qs)
    rms = jnp.sum(jnp.linalg.norm(moved - ps, axis=-1), axis=-1) / 4.0

    if centroid_p_global is not None:
        # De-normalized translation mapping original model coords to original
        # scene coords: t = cen_p + C_P - R (cen_q + C_Q).
        t = (
            cen_p
            + centroid_p_global
            - jnp.einsum("...ij,...j->...i", rot, cen_q + centroid_q_global)
        )
    else:
        t = cen_p - jnp.einsum("...ij,...j->...i", rot, cen_q)

    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    transform = jnp.concatenate([top, bottom], axis=-2)
    ok = okp & okq & ortho_ok
    return transform, rms, ok
