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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    nn_refresh=1,
):
    """nn_refresh > 1 recomputes nearest neighbors only every nn_refresh
    iterations and re-solves against the (model-frame) matched points in
    between - the [Ns, Nm] correspondence block is the bandwidth-heavy part
    of the loop, the 6x6 solve is nearly free. Classic LM-ICP-style inner
    iteration; convergence per iteration is slightly slower but each
    refresh window costs one correspondence pass instead of nn_refresh."""

    def correspond(tf):
        rot, t = tf[:3, :3], tf[:3, 3]
        tm = model_pts @ rot.T + t  # transformed model
        # NN + correspondence extraction as matmuls (gathers are slow on
        # TPU): a row-normalized argmin one-hot matrix pulls the matched
        # point/normal via [Ns, Nm] @ [Nm, 3] (MXU), ties averaged.
        # (bf16 for the cross term was tried and reverted: at ~0.5 m scene
        # offsets its absolute error is ~2e-3 on d^2 - larger than the 2 cm
        # correspondence scale - and ICP diverges.)
        d2 = (
            jnp.sum(seg_pts * seg_pts, axis=-1)[:, None]
            + jnp.sum(tm * tm, axis=-1)[None, :]
            - 2.0 * seg_pts @ tm.T
        )  # [Ns, Nm]
        mind2 = jnp.min(d2, axis=-1)
        onehot = (d2 <= mind2[:, None]).astype(jnp.float32)
        onehot = onehot / jnp.maximum(jnp.sum(onehot, axis=-1, keepdims=True), 1.0)
        p_model = onehot @ model_pts  # matched points in MODEL frame [Ns, 3]
        n_model = onehot @ model_nrm
        mind2 = jnp.where(seg_mask, mind2, jnp.inf)
        if exact_trim:
            w = _trim_weights(mind2, seg_mask, trim_fraction, max_corr_dist)
        else:
            w = _robust_weights(mind2, seg_mask, max_corr_dist)
        return p_model, n_model, w

    def solve(tf, p_model, n_model, w):
        rot, t = tf[:3, :3], tf[:3, 3]
        p = p_model @ rot.T + t
        n = n_model @ rot.T
        if point_to_plane:
            drot, dt = _solve_point_to_plane(p, seg_pts, n, w)
        else:
            drot, dt = _solve_point_to_point(p, seg_pts, w)
        new_rot = drot @ rot
        new_t = drot @ t + dt
        out = jnp.eye(4)
        return out.at[:3, :3].set(new_rot).at[:3, 3].set(new_t)

    if nn_refresh <= 1:
        def body(_, tf):
            return solve(tf, *correspond(tf))

        return jax.lax.fori_loop(0, iters, body, transform)

    n_outer = -(-iters // nn_refresh)

    def outer(outer_i, tf):
        p_model, n_model, w = correspond(tf)

        def inner(__, tf2):
            return solve(tf2, p_model, n_model, w)

        # Clamp the last window so total solves equal exactly `iters`
        # (otherwise iters=5, nn_refresh=2 would run 6 solves).
        n_inner = jnp.minimum(nn_refresh, iters - outer_i * nn_refresh)
        return jax.lax.fori_loop(0, n_inner, inner, tf)

    return jax.lax.fori_loop(0, n_outer, outer, transform)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "trim_fraction", "max_corr_dist", "point_to_plane", "h_chunk",
        "exact_trim", "nn_refresh",
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
    nn_refresh: int = 1,
) -> jnp.ndarray:
    """Refine H poses in parallel; returns [H, 4, 4].

    The hypothesis batch runs in chunks of h_chunk: the vmapped NN distance
    block is [h_chunk, Ns, Nm] (a full vmap over H would materialize an
    [H, Ns, Nm] tensor - 34 GB at H=8k, 1k-point clouds).
    nn_refresh > 1 reuses correspondences across that many solve iterations
    (see _icp_single) - ~nn_refresh x less bandwidth for slightly slower
    per-iteration convergence.
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
        nn_refresh=nn_refresh,
    )
    def safe(tf):
        # Degenerate segments (too few correspondences) can make the solve
        # emit NaNs; fall back to the unrefined pose per hypothesis.
        out = fn(tf)
        return jnp.where(jnp.all(jnp.isfinite(out)), out, tf)

    h = transforms.shape[0]
    if h <= h_chunk:
        return jax.vmap(safe)(transforms)
    pad = (-h) % h_chunk
    tfs = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad, 4, 4))], axis=0
    ).reshape(-1, h_chunk, 4, 4)
    out = jax.lax.map(jax.vmap(safe), tfs).reshape(-1, 4, 4)
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


# ---------------------------------------------------------------- Pallas path


def _icp_corr_kernel_segside(
    tr_ref,  # VMEM [TH, 128]: cols 0:12 = row-major (R | t), centered frame
    segcat_ref,  # VMEM [Spad, 128]: cols 0:3 = s, 3 = |s|^2 (1e9 invalid), 4 = 1
    segT_ref,  # VMEM [128, Spad]: rows 0:3 = s, row 4 = 1 (transposed pack)
    modelT_ref,  # VMEM [128, Nm]: rows 0:3 = m, 3 = pad marker, 4:7 = normal
    out_ref,  # VMEM [TH*8, 128]: per-hyp [8, 128] block = rows of G (see below)
    *,
    max_corr_dist: float,
    precision=None,
    pair: bool = True,  # False forces hb=1 (kept testable at small shapes)
):
    """Segment-stationary ICP correspondence + normal-equation accumulation.

    The lane-major restructure that won the LCP kernel its 2x
    (_lcp_kernel_segside design note) applied to ICP: per hypothesis the
    model tile is transformed with [1, Nm] ROW ops (lane-dense on the VPU),
    the NN reduction for each segment point runs across lanes, and the
    point-to-plane normal equations are accumulated with two further matmuls
    so no [Ns, 1] column ops and no transposes appear anywhere:

      d2[j, i]   = |s_j|^2 + |u_i|^2 - 2 s_j.u_i       (u = R m + t)
                 = a_seg[j, 0:5] . b1[0:5, i]            -- MXU
      wonehot    = 1[d2 == min_i d2] * welsch(min) / ties   [Spad, Nm]
      accT       = segT @ wonehot -> rows (Sx, Sy, Sz, W)  [128, Nm]
                   (S_i = sum_j w_j 1[nn_j = i] s_j; W_i = sum of weights)
      A[a,b]     = sum_i W_i col_a,i col_b,i,   col = (u x un, un)
      b[a]       = -sum_i col_a,i g_i,  g_i = W_i (u.un) - un.S_i
                   (from resid_j = (u - s_j).un for every j matched to i)
      G = M8 @ N128^T: G[a, 0:6] = A[a, :], G[a, 6] = -b[a]   -- MXU

    Only the [8, 128] G block per hypothesis leaves the chip; the XLA side
    solves the 6x6 systems and updates the poses. Replaces both the
    bandwidth-bound XLA [H, Ns, Nm] formulation and the old model-streaming
    kernel with [Ns, 1] column carries.
    """
    th = tr_ref.shape[0]
    nm = modelT_ref.shape[1]
    spad = segcat_ref.shape[0]
    lowp = precision == jax.lax.Precision.DEFAULT
    mm_dtype = jnp.bfloat16 if lowp else jnp.float32

    # Hypothesis pairing: the d2 and accT matmuls of two hypotheses pack
    # side-by-side in the lane axis (the _lcp_kernel_segside_hb trick at
    # HB=2 - bounded by the [Spad, HB*Nm] f32 d2 block in VMEM), halving
    # MXU launches of the two big matmuls per pass. Per-hypothesis work
    # (reductions, weights, the tiny G matmul) stays lane-chunk sliced.
    hb = 2 if (pair and th % 2 == 0 and spad * nm * 2 <= (1 << 21)) else 1

    # bf16 casts hoisted out of the per-hypothesis loop (same overhead fix
    # as _lcp_kernel_segside: native bf16 MXU inputs, no per-matmul
    # conversion of the big stationary operands).
    a_seg = segcat_ref[:, :].astype(mm_dtype)  # [Spad, 128]
    seg_t = segT_ref[:, :].astype(mm_dtype)  # [128, Spad]
    mx = modelT_ref[0:1, :]  # [1, Nm]
    my = modelT_ref[1:2, :]
    mz = modelT_ref[2:3, :]
    pad = modelT_ref[3:4, :]  # 1e9 on padded model columns, else 0
    nx = modelT_ref[4:5, :]
    ny = modelT_ref[5:6, :]
    nz = modelT_ref[6:7, :]
    sigma2 = (max_corr_dist * 0.5) ** 2

    def one_group(gi, _):
        rows = []  # per-hypothesis transformed-model rows
        for k in range(hb):
            hi = gi * hb + k
            r = [tr_ref[hi, kk] for kk in range(12)]
            r00, r01, r02, t0 = r[0], r[1], r[2], r[3]
            r10, r11, r12, t1 = r[4], r[5], r[6], r[7]
            r20, r21, r22, t2 = r[8], r[9], r[10], r[11]

            ux = r00 * mx + r01 * my + r02 * mz + t0  # [1, Nm]
            uy = r10 * mx + r11 * my + r12 * mz + t1
            uz = r20 * mx + r21 * my + r22 * mz + t2
            usq = ux * ux + uy * uy + uz * uz + pad
            unx = r00 * nx + r01 * ny + r02 * nz
            uny = r10 * nx + r11 * ny + r12 * nz
            unz = r20 * nx + r21 * ny + r22 * nz
            rows.append((ux, uy, uz, usq, unx, uny, unz))

        wide = hb * nm
        cat = lambda xs: (
            jnp.concatenate(xs, axis=1) if hb > 1 else xs[0]
        ).astype(mm_dtype)
        b1 = jnp.concatenate(
            [cat([-2.0 * r[0] for r in rows]), cat([-2.0 * r[1] for r in rows]),
             cat([-2.0 * r[2] for r in rows]), jnp.ones((1, wide), mm_dtype),
             cat([r[3] for r in rows]), jnp.zeros((123, wide), mm_dtype)],
            axis=0,
        )  # [128, HB*Nm]
        d2 = jax.lax.dot_general(
            a_seg, b1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [Spad, HB*Nm]

        # Per-hypothesis NN + Welsch weights on lane chunks; invalid/padded
        # segment rows carry |s|^2=1e9 so their mind2 is huge and the
        # in-range gate zeroes them.
        chunks = []
        for k in range(hb):
            d2k = d2[:, k * nm : (k + 1) * nm]
            mind2 = jnp.min(d2k, axis=1, keepdims=True)  # [Spad, 1]
            in_range = mind2 <= max_corr_dist * max_corr_dist
            w = jnp.where(in_range, jnp.exp(-mind2 / (2.0 * sigma2)), 0.0)
            is_best = (d2k <= mind2).astype(jnp.float32)
            ties = jnp.sum(is_best, axis=1, keepdims=True)
            chunks.append((is_best * (w / jnp.maximum(ties, 1.0))).astype(mm_dtype))
        wonehot = jnp.concatenate(chunks, axis=1) if hb > 1 else chunks[0]

        # accT rows: 0:3 = S (weighted matched segment-point sums), 4 = W.
        accT = jax.lax.dot_general(
            seg_t, wonehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [128, HB*Nm]

        for k in range(hb):
            (ux, uy, uz, usq, unx, uny, unz) = rows[k]
            sx_r = accT[0:1, k * nm : (k + 1) * nm]
            sy_r = accT[1:2, k * nm : (k + 1) * nm]
            sz_r = accT[2:3, k * nm : (k + 1) * nm]
            w_r = accT[4:5, k * nm : (k + 1) * nm]

            # Jacobian columns (model side, transformed frame): c = u x un, un.
            c1 = uy * unz - uz * uny
            c2 = uz * unx - ux * unz
            c3 = ux * uny - uy * unx
            pn = ux * unx + uy * uny + uz * unz  # u . un per model point
            g = w_r * pn - (unx * sx_r + uny * sy_r + unz * sz_r)  # [1, Nm]

            m8 = jnp.concatenate(
                [c1, c2, c3, unx, uny, unz, jnp.zeros((2, nm), jnp.float32)],
                axis=0,
            )  # [8, Nm]
            n128 = jnp.concatenate(
                [w_r * c1, w_r * c2, w_r * c3, w_r * unx, w_r * uny, w_r * unz,
                 g, jnp.zeros((121, nm), jnp.float32)], axis=0,
            )  # [128, Nm]
            gmat = jax.lax.dot_general(
                m8.astype(mm_dtype), n128.astype(mm_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [8, 128]
            out_ref[pl.ds((gi * hb + k) * 8, 8), :] = gmat
        return 0

    jax.lax.fori_loop(0, th // hb, one_group, 0)


def _icp_segside_pass(transforms, segcat, segT, modelT, max_corr_dist, precision,
                      pair=True):
    """One correspondence pass -> (A [H,6,6], b [H,6]).

    transforms are already in the centered frame (see refine_icp_pallas_segside).
    """
    h = transforms.shape[0]
    h_tile = 8
    pad_h = (-h) % h_tile
    tr16 = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad_h, 4, 4))], axis=0
    ).reshape(-1, 16)
    tr = jnp.zeros((tr16.shape[0], 128), jnp.float32).at[:, 0:12].set(tr16[:, 0:12])
    nm = modelT.shape[1]
    spad = segcat.shape[0]
    out = pl.pallas_call(
        functools.partial(
            _icp_corr_kernel_segside,
            max_corr_dist=max_corr_dist,
            precision=precision,
            pair=pair,
        ),
        out_shape=jax.ShapeDtypeStruct(((h + pad_h) * 8, 128), jnp.float32),
        grid=((h + pad_h) // h_tile,),
        in_specs=[
            # Transforms in SMEM: the kernel reads them as scalars.
            pl.BlockSpec((h_tile, 128), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((spad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, spad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, nm), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (h_tile * 8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tr, segcat, segT, modelT)
    g = out.reshape(-1, 8, 128)[:h]
    a = g[:, 0:6, 0:6]
    b = -g[:, 0:6, 6]
    return a, b


@functools.partial(
    jax.jit,
    static_argnames=("iters", "max_corr_dist", "matmul_precision",
                     "pair_hypotheses"),
)
def refine_icp_pallas_segside(
    transforms: jnp.ndarray,  # [H, 4, 4]
    model_pts: jnp.ndarray,  # [Nm, 3]
    model_nrm: jnp.ndarray,
    seg_pts: jnp.ndarray,  # [Ns, 3]
    seg_mask: jnp.ndarray,
    iters: int = 6,
    max_corr_dist: float = 0.02,
    matmul_precision: str | None = None,
    pair_hypotheses: bool = True,
) -> jnp.ndarray:
    """Segment-stationary Pallas point-to-plane ICP (see _icp_corr_kernel_segside).

    Equivalent math to refine_icp(point_to_plane=True, exact_trim=False,
    nn_refresh=1): every iteration recomputes correspondences (they are cheap
    here - the whole [Spad, Nm] correspondence block lives in VMEM and only
    42 floats per hypothesis cross HBM per iteration).

    Coordinates are centered at the segment centroid (segment AND model/
    transform sides) before packing, for the same bf16-safety reason as
    lcp_scores_pallas_segside; results are returned in the original frame.

    Requires the whole model in one VMEM block: (Spad * Nm) f32 x2 live
    blocks <= ~8 MB, i.e. Spad * Nm <= 1M. Callers fall back to refine_icp
    beyond that (ops/scoring.py handles the dispatch).
    """
    ns = seg_pts.shape[0]
    nm = model_pts.shape[0]
    pad_ns = (-ns) % 128  # lane-aligned for the transposed pack
    pad_nm = (-nm) % 128

    c = jnp.sum(jnp.where(seg_mask[:, None], seg_pts, 0.0), axis=0) / jnp.maximum(
        jnp.sum(seg_mask), 1
    )
    seg_c = seg_pts - c
    transforms_c = transforms.at[:, :3, 3].add(-c)

    segcat = jnp.zeros((ns + pad_ns, 128), jnp.float32)
    seg_sq = jnp.sum(seg_c * seg_c, axis=-1)
    segcat = (
        segcat.at[:ns, 0:3].set(seg_c)
        .at[:ns, 3].set(jnp.where(seg_mask, seg_sq, 1e9))
        .at[ns:, 3].set(1e9)
        .at[:, 4].set(1.0)
    )
    # Transposed segment pack for the accumulator matmul (standard (1,0)
    # contraction; a lhs-transposed (0,0) contraction on segcat is not a
    # proven Mosaic lowering in this codebase). Invalid segment rows are
    # zeroed: their wonehot column weight is already 0 via |s|^2 = 1e9, and
    # zero coords keep the ones-row sum (W) exact.
    segT = jnp.zeros((128, ns + pad_ns), jnp.float32)
    segT = (
        segT.at[0:3, :ns].set(jnp.where(seg_mask, seg_c.T, 0.0))
        .at[4, :].set(1.0)
    )
    modelT = jnp.zeros((128, nm + pad_nm), jnp.float32)
    modelT = (
        modelT.at[0:3, :nm].set(model_pts.T)
        .at[3, nm:].set(1e9)
        .at[4:7, :nm].set(model_nrm.T)
    )
    precision = _ICP_PRECISIONS[matmul_precision]

    def step(tfs, _):
        a, b = _icp_segside_pass(tfs, segcat, segT, modelT, max_corr_dist,
                                 precision, pair=pair_hypotheses)
        a = a + 1e-8 * jnp.eye(6)
        x = jnp.linalg.solve(a, b[..., None])[..., 0]  # [H, 6]
        omega, t = x[:, :3], x[:, 3:]
        theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
        k = omega / jnp.maximum(theta, 1e-12)
        zeros = jnp.zeros_like(k[:, 0])
        kx = jnp.stack(
            [zeros, -k[:, 2], k[:, 1],
             k[:, 2], zeros, -k[:, 0],
             -k[:, 1], k[:, 0], zeros], axis=-1,
        ).reshape(-1, 3, 3)
        st = jnp.sin(theta)[..., None]
        ct = (1.0 - jnp.cos(theta))[..., None]
        drot = jnp.eye(3)[None] + st * kx + ct * (kx @ kx)
        new_rot = drot @ tfs[:, :3, :3]
        new_t = jnp.einsum("hij,hj->hi", drot, tfs[:, :3, 3]) + t
        out = jnp.broadcast_to(jnp.eye(4), tfs.shape).at[:, :3, :3].set(new_rot)
        out = out.at[:, :3, 3].set(new_t)
        # NaN-safe: degenerate correspondence sets fall back to the input pose.
        finite = jnp.all(jnp.isfinite(out), axis=(1, 2), keepdims=True)
        return jnp.where(finite, out, tfs), None

    refined, _ = jax.lax.scan(step, transforms_c, None, length=iters)
    return refined.at[:, :3, 3].add(c)


# Mosaic's dot lowering supports only DEFAULT and HIGHEST ("high" raises
# NotImplementedError on v5e - measured round 3); None inherits the jax
# default (float32, _jaxcfg.py).
_ICP_PRECISIONS = {
    None: None,
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _icp_corr_kernel(
    tr_ref,  # VMEM [TH, 128]: cols 0:12 = row-major (R | t)
    segcat_ref,  # VMEM [Ns, 128]: cols 0:5 = (x, y, z, |s|^2, 1), col 6 = mask
    modelcat_ref,  # VMEM [Nm, 128]: cols 0:3 = point, 3:6 = normal
    out_ref,  # VMEM [TH, 128]: cols 0:36 = A (6x6 row-major), 36:42 = b
    *,
    nm_tile: int,
    max_corr_dist: float,
):
    """One ICP correspondence+accumulate pass for TH hypotheses.

    For each segment point: NN among the transformed model points (streamed
    in tiles; distances via the K=128-packed matmul trick), matched point and
    normal pulled with an argmin one-hot matmul; then the weighted
    point-to-plane normal equations A x = b are accumulated in VMEM and only
    the 42 floats per hypothesis leave the chip - the XLA side solves 6x6 and
    updates poses. Replaces the bandwidth-bound [H, Ns, Nm] XLA formulation.
    """
    ns = segcat_ref.shape[0]
    nm = modelcat_ref.shape[0]
    th = tr_ref.shape[0]
    big = jnp.float32(1e9)

    a_seg = segcat_ref[:, :]  # [Ns, 128]
    sx = segcat_ref[:, 0:1]
    sy = segcat_ref[:, 1:2]
    sz = segcat_ref[:, 2:3]
    smask = segcat_ref[:, 6:7]

    def one_hypothesis(hi, _):
        r = [tr_ref[hi, k] for k in range(12)]
        r00, r01, r02, t0 = r[0], r[1], r[2], r[3]
        r10, r11, r12, t1 = r[4], r[5], r[6], r[7]
        r20, r21, r22, t2 = r[8], r[9], r[10], r[11]

        def model_tile(mi, carry):
            run_min, run_matched = carry  # [Ns, 1], [Ns, 128]
            rows = pl.ds(mi * nm_tile, nm_tile)
            mx = modelcat_ref[rows, 0:1]
            my = modelcat_ref[rows, 1:2]
            mz = modelcat_ref[rows, 2:3]
            nx = modelcat_ref[rows, 3:4]
            ny = modelcat_ref[rows, 4:5]
            nz = modelcat_ref[rows, 5:6]
            # Transformed model point/normal (model -> scene).
            tmx = r00 * mx + r01 * my + r02 * mz + t0
            tmy = r10 * mx + r11 * my + r12 * mz + t1
            tmz = r20 * mx + r21 * my + r22 * mz + t2
            tnx = r00 * nx + r01 * ny + r02 * nz
            tny = r10 * nx + r11 * ny + r12 * nz
            tnz = r20 * nx + r21 * ny + r22 * nz
            tsq = tmx * tmx + tmy * tmy + tmz * tmz

            zeros_tail = jnp.zeros((nm_tile, 128 - 5), jnp.float32)
            ones = jnp.ones((nm_tile, 1), jnp.float32)
            b1 = jnp.concatenate(
                [-2.0 * tmx, -2.0 * tmy, -2.0 * tmz, ones, tsq, zeros_tail], axis=1
            )  # matches seg cols (x, y, z, |s|^2, 1)
            d2 = jax.lax.dot_general(
                a_seg, b1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Ns, nm_tile]
            tile_min = jnp.min(d2, axis=-1, keepdims=True)
            onehot = (d2 <= tile_min).astype(jnp.float32)
            onehot = onehot / jnp.maximum(
                jnp.sum(onehot, axis=-1, keepdims=True), 1.0
            )
            packed = jnp.concatenate(
                [tmx, tmy, tmz, tnx, tny, tnz,
                 jnp.zeros((nm_tile, 128 - 6), jnp.float32)],
                axis=1,
            )  # [nm_tile, 128]
            matched = jax.lax.dot_general(
                onehot, packed, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Ns, 128]
            better = tile_min < run_min
            return (
                jnp.where(better, tile_min, run_min),
                jnp.where(better, matched, run_matched),
            )

        init = (
            jnp.full((ns, 1), big, jnp.float32),
            jnp.zeros((ns, 128), jnp.float32),
        )
        run_min, run_matched = jax.lax.fori_loop(0, nm // nm_tile, model_tile, init)

        px = run_matched[:, 0:1]
        py = run_matched[:, 1:2]
        pz = run_matched[:, 2:3]
        nx_ = run_matched[:, 3:4]
        ny_ = run_matched[:, 4:5]
        nz_ = run_matched[:, 5:6]
        # Welsch robust weights (see _robust_weights).
        sigma2 = (max_corr_dist * 0.5) ** 2
        in_range = (smask > 0.5) & (run_min <= max_corr_dist * max_corr_dist)
        w = jnp.where(in_range, jnp.exp(-run_min / (2.0 * sigma2)), 0.0)  # [Ns,1]
        # Point-to-plane residual and Jacobian columns.
        resid = (px - sx) * nx_ + (py - sy) * ny_ + (pz - sz) * nz_
        c1 = py * nz_ - pz * ny_
        c2 = pz * nx_ - px * nz_
        c3 = px * ny_ - py * nx_
        cols = (c1, c2, c3, nx_, ny_, nz_)
        # Accumulate A (6x6) and b (6) as scalars.
        vals = []
        for i in range(6):
            for jcol in range(6):
                vals.append(jnp.sum(w * cols[i] * cols[jcol]))
        for i in range(6):
            vals.append(-jnp.sum(w * cols[i] * resid))
        row = jnp.concatenate(
            [jnp.full((1, 1), v, jnp.float32) for v in vals]
            + [jnp.zeros((1, 128 - len(vals)), jnp.float32)],
            axis=1,
        )
        out_ref[pl.ds(hi, 1), :] = row
        return 0

    jax.lax.fori_loop(0, th, one_hypothesis, 0)


def _icp_pallas_pass(transforms, segcat, modelcat, max_corr_dist, nm_tile=256):
    """One correspondence pass -> (A [H,6,6], b [H,6])."""
    h = transforms.shape[0]
    h_tile = 8
    pad_h = (-h) % h_tile
    tr16 = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad_h, 4, 4))], axis=0
    ).reshape(-1, 16)
    tr = jnp.zeros((tr16.shape[0], 128), jnp.float32).at[:, 0:12].set(tr16[:, 0:12])
    nm = modelcat.shape[0]
    out = pl.pallas_call(
        functools.partial(
            _icp_corr_kernel, nm_tile=min(nm_tile, nm), max_corr_dist=max_corr_dist
        ),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, 128), jnp.float32),
        grid=((h + pad_h) // h_tile,),
        in_specs=[
            pl.BlockSpec((h_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (segcat.shape[0], 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((nm, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (h_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tr, segcat, modelcat)
    a = out[:h, 0:36].reshape(h, 6, 6)
    b = out[:h, 36:42]
    return a, b


@functools.partial(
    jax.jit, static_argnames=("iters", "max_corr_dist", "nm_tile")
)
def refine_icp_pallas(
    transforms: jnp.ndarray,  # [H, 4, 4]
    model_pts: jnp.ndarray,  # [Nm, 3]
    model_nrm: jnp.ndarray,
    seg_pts: jnp.ndarray,  # [Ns, 3]
    seg_mask: jnp.ndarray,
    iters: int = 10,
    max_corr_dist: float = 0.02,
    nm_tile: int = 256,
) -> jnp.ndarray:
    """Pallas point-to-plane ICP: H poses refined in parallel on TPU.

    Equivalent math to refine_icp(point_to_plane=True, exact_trim=False);
    correspondences + normal equations accumulate on-chip, only 42 floats
    per hypothesis per iteration cross HBM.
    """
    ns = seg_pts.shape[0]
    nm = model_pts.shape[0]
    pad_nm = (-nm) % min(nm_tile, nm)
    segcat = jnp.zeros((ns, 128), jnp.float32)
    segcat = (
        segcat.at[:, 0:3].set(seg_pts)
        .at[:, 3].set(jnp.sum(seg_pts * seg_pts, axis=-1))
        .at[:, 4].set(1.0)
        .at[:, 6].set(seg_mask.astype(jnp.float32))
    )
    modelcat = jnp.zeros((nm + pad_nm, 128), jnp.float32)
    modelcat = (
        modelcat.at[:nm, 0:3].set(model_pts)
        .at[:nm, 3:6].set(model_nrm)
        # padded model rows pushed far away so they never match
        .at[nm:, 0:3].set(1e4)
    )

    def step(tfs, _):
        a, b = _icp_pallas_pass(tfs, segcat, modelcat, max_corr_dist, nm_tile)
        a = a + 1e-8 * jnp.eye(6)
        x = jnp.linalg.solve(a, b[..., None])[..., 0]  # [H, 6]
        omega, t = x[:, :3], x[:, 3:]
        theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
        k = omega / jnp.maximum(theta, 1e-12)
        zeros = jnp.zeros_like(k[:, 0])
        kx = jnp.stack(
            [zeros, -k[:, 2], k[:, 1],
             k[:, 2], zeros, -k[:, 0],
             -k[:, 1], k[:, 0], zeros], axis=-1,
        ).reshape(-1, 3, 3)
        st = jnp.sin(theta)[..., None]
        ct = (1.0 - jnp.cos(theta))[..., None]
        drot = jnp.eye(3)[None] + st * kx + ct * (kx @ kx)
        new_rot = drot @ tfs[:, :3, :3]
        new_t = jnp.einsum("hij,hj->hi", drot, tfs[:, :3, 3]) + t
        out = jnp.broadcast_to(jnp.eye(4), tfs.shape).at[:, :3, :3].set(new_rot)
        out = out.at[:, :3, 3].set(new_t)
        return out, None

    refined, _ = jax.lax.scan(step, transforms, None, length=iters)
    return refined
