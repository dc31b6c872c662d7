"""LCP / weighted-LCP verification: score H pose hypotheses in parallel.

Reference semantics (match4pcsBase.cc:1699-1766):
- Verify: fraction of (dense) model points whose transformed position has a
  scene-segment point within delta (kd-tree NN query, radius delta).
- WeightedVerify: same NN query, but a match only counts if the rotated model
  normal agrees with the matched segment point's normal within 30 degrees
  (folded: min(angle, |180-angle|)), and it contributes that segment point's
  segmentation probability instead of 1. Score normalized by model size.

TPU design: the kd-tree becomes a brute-force distance computation packed as
one matmul per (hypothesis-tile, model-tile, segment-tile) — the 5-column
homogeneous trick turns ||a-b||^2 into an exact matmul:
  a' = [p, |p|^2, 1], b' = [-2q, 1, |q|^2]  =>  a' b'^T = ||p-q||^2.
A Pallas kernel streams segment tiles through VMEM with running
(min-distance, matched-prob, matched-normal-dot) state; the XLA fallback uses
lax.map over hypothesis chunks. Thousands of hypotheses score in one launch —
the reference's hottest serial loop (SURVEY.md section 3, hot loop #1).
"""

from __future__ import annotations

import functools
import math

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_transforms(transforms: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """[H,4,4] x [N,3] -> [H,N,3]."""
    return (
        jnp.einsum("hij,nj->hni", transforms[:, :3, :3], pts)
        + transforms[:, None, :3, 3]
    )


def lcp_scores_xla(
    transforms: jnp.ndarray,
    model_pts: jnp.ndarray,
    model_nrm: jnp.ndarray,
    seg_pts: jnp.ndarray,
    seg_nrm: jnp.ndarray,
    seg_prob: jnp.ndarray,
    seg_mask: jnp.ndarray,
    delta: float = 0.005,
    normal_gate_deg: float = 30.0,
    weighted: bool = True,
    h_chunk: int = 8,
) -> jnp.ndarray:
    """Portable XLA implementation.

    Args:
      transforms: [H, 4, 4] model->scene candidate poses.
      model_pts/model_nrm: [Nv, 3] dense validation cloud (+unit normals).
      seg_pts/seg_nrm: [Ns, 3]; seg_prob/seg_mask: [Ns].
    Returns:
      scores [H]: weighted (or plain) LCP in [0, 1].
    """
    h = transforms.shape[0]
    nv = model_pts.shape[0]
    pad_h = (-h) % h_chunk
    tr = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad_h, 4, 4))], axis=0
    )
    tr_chunks = tr.reshape(-1, h_chunk, 4, 4)

    seg_sq = jnp.sum(seg_pts * seg_pts, axis=-1)
    big = jnp.float32(1e9)
    seg_sq_m = jnp.where(seg_mask, seg_sq, big)  # invalid segment pts never match
    cos_gate = jnp.cos(jnp.deg2rad(normal_gate_deg))

    def score_chunk(tc):
        tm = _apply_transforms(tc, model_pts)  # [hc, Nv, 3]
        tn = jnp.einsum("hij,nj->hni", tc[:, :3, :3], model_nrm)
        d2 = (
            jnp.sum(tm * tm, axis=-1)[..., None]
            + seg_sq_m[None, None, :]
            - 2.0 * jnp.einsum("hni,mi->hnm", tm, seg_pts)
        )  # [hc, Nv, Ns]
        nn = jnp.argmin(d2, axis=-1)  # [hc, Nv]
        min_d2 = jnp.take_along_axis(d2, nn[..., None], axis=-1)[..., 0]
        within = min_d2 <= delta * delta
        if not weighted:
            return jnp.sum(within, axis=-1) / nv
        ndot = jnp.sum(tn * seg_nrm[nn], axis=-1)  # [hc, Nv]
        # Reference folds the angle: min(angle, |180-angle|) < 30.
        ngate = jnp.abs(ndot) >= cos_gate
        contrib = jnp.where(within & ngate, seg_prob[nn], 0.0)
        return jnp.sum(contrib, axis=-1) / nv

    scores = jax.lax.map(score_chunk, tr_chunks).reshape(-1)
    return scores[:h]


def _lcp_kernel(
    tr_ref,  # VMEM [TH, 128]: cols 0:12 = row-major (R | t) per hypothesis
    model_ref,  # VMEM [Nv, 128]: cols 0:5 = (x, y, z, |m|^2, 1); cols 8:11 = normal
    segcat_ref,  # VMEM [Ns, 128]: cols 0:3 pts, 3:6 nrm, 6 prob, 7 mask
    out_ref,  # VMEM [TH, 128]: per-hypothesis score broadcast across the row
    *,
    ns_tile: int,
    delta: float,
    cos_gate: float,
    weighted: bool,
    total_nv: int,
    precision=None,
):
    """Grid (h_tiles, nv_tiles): TH hypotheses x one model tile per program.

    The squared distance ||R m + t - s||^2 is rewritten as
    |m|^2 + |s - t|^2 - 2 m . (R^T (s - t)): only the (small) segment tile is
    transformed per hypothesis, and both the distance and the normal-dot
    reduce to [nv_tile, 128] @ [128, ns_tile] matmuls. K is zero-padded to
    the MXU's native 128 - free, since the MXU processes K=128 per pass.
    The score is a sum over model points, so model tiles accumulate into the
    (revisited) output block across the inner grid dimension.
    """
    nv = model_ref.shape[0]  # the model TILE size (total nv passed separately)
    th = tr_ref.shape[0]
    big = jnp.float32(1e9)
    j = pl.program_id(1)

    a_pos = model_ref[:, :]  # [nv_tile, 128] - b's zero lanes mask unused cols

    def one_hypothesis(hi, _):
        # Transform scalars (column k of R = row k of R^T = B).
        r = [tr_ref[hi, k] for k in range(12)]
        r00, r01, r02, t0 = r[0], r[1], r[2], r[3]
        r10, r11, r12, t1 = r[4], r[5], r[6], r[7]
        r20, r21, r22, t2 = r[8], r[9], r[10], r[11]

        partial = _score_one(
            a_pos, segcat_ref, ns_tile, delta, cos_gate, weighted, big, total_nv,
            (r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2),
            precision,
        )
        row = jnp.full((1, 128), partial, jnp.float32)
        prev = out_ref[pl.ds(hi, 1), :]
        out_ref[pl.ds(hi, 1), :] = jnp.where(j == 0, row, prev + row)
        return 0

    # fori (not Python unroll): unrolling stacks each iteration's VMEM
    # buffers and blows the 16 MB scoped-vmem limit on real TPUs.
    jax.lax.fori_loop(0, th, one_hypothesis, 0)


def _score_one(a_pos, segcat_ref, ns_tile, delta, cos_gate, weighted, big, nv, scal,
               precision=None):
    """Partial score of this model tile (normalized by the FULL model size nv)."""
    (r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2) = scal
    ns = segcat_ref.shape[0]
    nv_tile = a_pos.shape[0]

    def seg_tile(si, carry):
        run_min, run_prob, run_dot = carry  # [Nv, 1] each
        rows = pl.ds(si * ns_tile, ns_tile)
        sx = segcat_ref[rows, 0:1]  # [tile, 1]
        sy = segcat_ref[rows, 1:2]
        sz = segcat_ref[rows, 2:3]
        nx = segcat_ref[rows, 3:4]
        ny = segcat_ref[rows, 4:5]
        nz = segcat_ref[rows, 5:6]
        sprob = segcat_ref[rows, 6:7]
        smask = segcat_ref[rows, 7:8]

        dx = sx - t0
        dy = sy - t1
        dz = sz - t2
        # q = R^T (s - t)
        qx = r00 * dx + r10 * dy + r20 * dz
        qy = r01 * dx + r11 * dy + r21 * dz
        qz = r02 * dx + r12 * dy + r22 * dz
        c = dx * dx + dy * dy + dz * dz
        c = jnp.where(smask > 0.5, c, big)  # invalid segment points never match
        # bn = R^T sn
        bnx = r00 * nx + r10 * ny + r20 * nz
        bny = r01 * nx + r11 * ny + r21 * nz
        bnz = r02 * nx + r12 * ny + r22 * nz

        zeros_tail = jnp.zeros((ns_tile, 128 - 11), jnp.float32)
        zeros_gap = jnp.zeros((ns_tile, 3), jnp.float32)
        ones = jnp.ones((ns_tile, 1), jnp.float32)
        # b1 matches model cols 0:5; b2 matches model cols 8:11.
        b1 = jnp.concatenate(
            [-2.0 * qx, -2.0 * qy, -2.0 * qz, ones, c,
             zeros_gap, jnp.zeros((ns_tile, 3), jnp.float32), zeros_tail],
            axis=1,
        )  # [tile, 128]
        b2 = jnp.concatenate(
            [jnp.zeros((ns_tile, 8), jnp.float32), bnx, bny, bnz, zeros_tail],
            axis=1,
        )
        d2 = jax.lax.dot_general(
            a_pos, b1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [Nv, tile]
        ndot = jax.lax.dot_general(
            a_pos, b2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        tile_min = jnp.min(d2, axis=-1, keepdims=True)  # [Nv, 1]
        is_best = d2 <= tile_min
        prob_row = jnp.broadcast_to(sprob[:, 0][None, :], d2.shape)
        tile_prob = jnp.max(jnp.where(is_best, prob_row, -1.0), axis=-1, keepdims=True)
        tile_dot = jnp.max(jnp.where(is_best, jnp.abs(ndot), -1.0), axis=-1, keepdims=True)
        better = tile_min < run_min
        return (
            jnp.where(better, tile_min, run_min),
            jnp.where(better, tile_prob, run_prob),
            jnp.where(better, tile_dot, run_dot),
        )

    init = (
        jnp.full((nv_tile, 1), big, jnp.float32),
        jnp.zeros((nv_tile, 1), jnp.float32),
        jnp.zeros((nv_tile, 1), jnp.float32),
    )
    run_min, run_prob, run_dot = jax.lax.fori_loop(0, ns // ns_tile, seg_tile, init)
    within = run_min <= delta * delta
    if weighted:
        contrib = jnp.where(within & (run_dot >= cos_gate), run_prob, 0.0)
    else:
        contrib = within.astype(jnp.float32)
    return jnp.sum(contrib) / nv


# Mosaic's dot lowering supports only DEFAULT and HIGHEST ("high" raises
# NotImplementedError on v5e - measured round 3); None inherits the jax
# default (float32, _jaxcfg.py). "high3" is this module's own 3-pass
# bf16 hi/lo split (see _dot_high3) - the missing middle tier, implemented
# manually because Mosaic won't lower Precision.HIGH.
_PRECISIONS = {
    None: None,
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
    "high3": "high3",
}


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x (error ~2^-16 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_high3(a, b):
    """3-pass bf16 emulation of an f32 matmul on the MXU.

    a @ b = a_hi@b_hi + a_hi@b_lo + a_lo@b_hi (+ a_lo@b_lo, dropped: its
    magnitude is ~2^-32 relative). Equivalent to XLA's Precision.HIGH, which
    Mosaic cannot lower; vs HIGHEST (6 passes) this is ~2x the MXU rate at
    ~1e-7 absolute error on centered-coordinate d^2 - 100x under the
    delta^2 = 2.5e-5 match threshold, i.e. fp32-grade for LCP purposes
    (gated on-chip by tests/test_tpu_bf16.py at the production flags).
    """
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    dims = (((1,), (0,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (
        jax.lax.dot_general(a_hi, b_hi, dims, **kw)
        + jax.lax.dot_general(a_hi, b_lo, dims, **kw)
        + jax.lax.dot_general(a_lo, b_hi, dims, **kw)
    )


@functools.partial(
    jax.jit,
    static_argnames=("delta", "normal_gate_deg", "weighted", "ns_tile",
                     "matmul_precision"),
)
def lcp_scores_pallas(
    transforms: jnp.ndarray,
    model_pts: jnp.ndarray,
    model_nrm: jnp.ndarray,
    seg_pts: jnp.ndarray,
    seg_nrm: jnp.ndarray,
    seg_prob: jnp.ndarray,
    seg_mask: jnp.ndarray,
    delta: float = 0.005,
    normal_gate_deg: float = 30.0,
    weighted: bool = True,
    ns_tile: int = 1024,
    matmul_precision: str | None = None,
) -> jnp.ndarray:
    """Pallas TPU kernel: grid over hypothesis tiles, segment tiles stream
    through VMEM with running NN state. Falls back on identical math to
    lcp_scores_xla (tested for equivalence).

    matmul_precision: None/"highest" = exact f32 distances (6 bf16 MXU
    passes); "default" = 1 bf16 pass (~6x faster, d^2 error ~5e-5 -
    coarse-ranking only). Mosaic has no 3-pass "high" lowering."""
    h = transforms.shape[0]
    nv = model_pts.shape[0]
    ns = seg_pts.shape[0]
    ns_tile = min(ns_tile, ns + ((-ns) % 128))
    pad_ns = (-ns) % ns_tile
    h_tile = 8  # sublane tile: 8 hypotheses per grid program (internal constant)
    pad_h = (-h) % h_tile
    # VMEM budget: the kernel's live [nv_tile, ns_tile] d2 + ndot blocks must
    # stay well under the 16 MB scoped-vmem limit (f32, x2 blocks, plus a/b
    # operands) - larger ns_tile means fewer b-builds and wider MXU launches
    # (measured 1.7x on the coarse stage), so cap nv_tile to compensate.
    # Rounded down to a multiple of 128: Mosaic block shapes must have their
    # last two dims divisible by (8, 128) unless equal to the array dims.
    nv_tile = min(nv, max(512, ((1 << 20) // ns_tile) // 128 * 128))
    pad_nv = (-nv) % nv_tile

    tr16 = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad_h, 4, 4))], axis=0
    ).reshape(-1, 16)
    tr = jnp.zeros((tr16.shape[0], 128), jnp.float32).at[:, 0:12].set(tr16[:, 0:12])
    # Model pack: cols 0:5 = (x, y, z, |m|^2, 1) for the distance matmul,
    # cols 8:11 = normal for the normal-agreement matmul. Padded rows get a
    # huge |m|^2 so they can never fall within delta of a segment point.
    modelcat = jnp.zeros((nv + pad_nv, 128), jnp.float32)
    modelcat = (
        modelcat.at[:nv, 0:3].set(model_pts)
        .at[:nv, 3].set(jnp.sum(model_pts * model_pts, axis=-1))
        .at[nv:, 3].set(1e9)
        .at[:, 4].set(1.0)
        .at[:nv, 8:11].set(model_nrm)
    )
    segcat = jnp.zeros((ns + pad_ns, 128), jnp.float32)
    segcat = (
        segcat.at[:ns, 0:3]
        .set(seg_pts)
        .at[:ns, 3:6]
        .set(seg_nrm)
        .at[:ns, 6]
        .set(seg_prob)
        .at[:ns, 7]
        .set(seg_mask.astype(jnp.float32))
    )

    out = pl.pallas_call(
        functools.partial(
            _lcp_kernel,
            ns_tile=min(ns_tile, ns + pad_ns),
            delta=delta,
            cos_gate=math.cos(math.radians(normal_gate_deg)),
            weighted=weighted,
            total_nv=nv,
            # No high3 path in the streaming kernel; degrade to the
            # strictly-more-precise HIGHEST (only the exact tier requests
            # high3, and its segments fit the segside kernel).
            precision=(jax.lax.Precision.HIGHEST
                       if matmul_precision == "high3"
                       else _PRECISIONS[matmul_precision]),
        ),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, 128), jnp.float32),
        grid=((h + pad_h) // h_tile, (nv + pad_nv) // nv_tile),
        in_specs=[
            pl.BlockSpec((h_tile, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nv_tile, 128), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ns + pad_ns, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (h_tile, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tr, modelcat, segcat)
    return out[:h, 0]


def lcp_scores(
    transforms,
    model_pts,
    model_nrm,
    seg_pts,
    seg_nrm,
    seg_prob,
    seg_mask,
    delta: float = 0.005,
    normal_gate_deg: float = 30.0,
    weighted: bool = True,
    use_pallas: bool | None = None,
    matmul_precision: str | None = None,
    hb_lane_pack: bool | None = None,
):
    """Dispatch: Pallas on TPU, XLA elsewhere.

    The segment-stationary kernel is the production TPU path (2x the
    model-stationary kernel on the coarse stage, equal on the fine stage);
    segments larger than one VMEM block fall back to the model-stationary
    streaming kernel."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    kw = {}
    if use_pallas:
        kw["matmul_precision"] = matmul_precision
        segside = seg_pts.shape[0] <= 2048
        if segside and hb_lane_pack is not None:
            kw["hb_lane_pack"] = hb_lane_pack
        fn = lcp_scores_pallas_segside if segside else lcp_scores_pallas
    else:
        fn = lcp_scores_xla
    return fn(
        transforms,
        model_pts,
        model_nrm,
        seg_pts,
        seg_nrm,
        seg_prob,
        seg_mask,
        delta=delta,
        normal_gate_deg=normal_gate_deg,
        weighted=weighted,
        **kw,
    )


def _lcp_kernel_segside(
    tr_ref,  # VMEM [TH, 128]: cols 0:12 = row-major (R | t) per hypothesis
    modelT_ref,  # VMEM [128, nv_tile]: rows 0:3 coords, 3 pad marker, 4:7 normals
    segcat_ref,  # VMEM [Ns, 128]: cols 0:3 s, 3 |s|^2(+big if invalid), 4 ones,
    #              5:8 segment normal, 8 prob
    out_ref,  # VMEM [TH, 128]
    *,
    delta: float,
    cos_gate: float,
    weighted: bool,
    total_nv: int,
    precision=None,
):
    """Segment-stationary layout: the a-matrix is a pure function of the
    segment (packed once on the host); per-hypothesis work is transforming
    the MODEL tile - all [1, nv_tile] row ops (lane-dense on the VPU, vs the
    model-stationary kernel's [ns, 1] column ops that waste 127/128 lanes,
    ~8 us/hyp of pure overhead measured on v5e) - and the NN reduction runs
    down the sublane axis, leaving every carry lane-major.

      d2[j, i] = |s_j|^2 + |u_i|^2 - 2 s_j . u_i,  u = R m + t
               = a_seg[j, 0:5] . b1[0:5, i],
      b1 rows: (-2u_x, -2u_y, -2u_z, ones, |u|^2 + pad);
      ndot[j, i] = sn_j . (R n_i) = a_seg[j, 5:8] . b2[5:8, i].

    Per-hypothesis overhead killers (measured ~1.9 us/hyp fixed cost at
    coarse shapes before these, round 3):
    - the 12 transform scalars live in SMEM (tr_ref block), not VMEM
      vector-loads;
    - at "default" (bf16) precision the segment operand is cast to bf16
      ONCE per grid program and the b-builds are cast row-wise, so the MXU
      gets native bf16 inputs instead of converting the f32 a-matrix under
      every per-hypothesis matmul.
    """
    th = tr_ref.shape[0]
    nv_tile = modelT_ref.shape[1]
    j = pl.program_id(1)
    lowp = precision == jax.lax.Precision.DEFAULT
    high3 = precision == "high3"
    mm_dtype = jnp.bfloat16 if lowp else jnp.float32

    a_seg = segcat_ref[:, :].astype(mm_dtype)  # [Ns, 128], cast hoisted
    if high3:
        # 3-pass bf16 split (see _dot_high3); the segment operand's split is
        # hoisted out of the per-hypothesis loop.
        a_hi, a_lo = _split_bf16(a_seg)

    def mm(b):
        if high3:
            b_hi, b_lo = _split_bf16(b)
            dims = (((1,), (0,)), ((), ()))
            kw = dict(preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
            return (
                jax.lax.dot_general(a_hi, b_hi, dims, **kw)
                + jax.lax.dot_general(a_hi, b_lo, dims, **kw)
                + jax.lax.dot_general(a_lo, b_hi, dims, **kw)
            )
        return jax.lax.dot_general(
            a_seg, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    prob_col = segcat_ref[:, 8:9]  # [Ns, 1]

    mx = modelT_ref[0:1, :]  # [1, nv]
    my = modelT_ref[1:2, :]
    mz = modelT_ref[2:3, :]
    pad = modelT_ref[3:4, :]  # 1e9 on padded model columns, else 0
    nx = modelT_ref[4:5, :]
    ny = modelT_ref[5:6, :]
    nz = modelT_ref[6:7, :]
    ones_row = jnp.ones((1, nv_tile), mm_dtype)
    zrow123 = jnp.zeros((123, nv_tile), mm_dtype)
    zrow120 = jnp.zeros((120, nv_tile), mm_dtype)
    zrow5 = jnp.zeros((5, nv_tile), mm_dtype)

    def one_hypothesis(hi, _):
        r = [tr_ref[hi, k] for k in range(12)]
        r00, r01, r02, t0 = r[0], r[1], r[2], r[3]
        r10, r11, r12, t1 = r[4], r[5], r[6], r[7]
        r20, r21, r22, t2 = r[8], r[9], r[10], r[11]

        ux = r00 * mx + r01 * my + r02 * mz + t0  # [1, nv]
        uy = r10 * mx + r11 * my + r12 * mz + t1
        uz = r20 * mx + r21 * my + r22 * mz + t2
        usq = ux * ux + uy * uy + uz * uz + pad
        unx = r00 * nx + r01 * ny + r02 * nz
        uny = r10 * nx + r11 * ny + r12 * nz
        unz = r20 * nx + r21 * ny + r22 * nz

        b1 = jnp.concatenate(
            [(-2.0 * ux).astype(mm_dtype), (-2.0 * uy).astype(mm_dtype),
             (-2.0 * uz).astype(mm_dtype), ones_row, usq.astype(mm_dtype),
             zrow123], axis=0,
        )  # [128, nv]
        d2 = mm(b1)  # [Ns, nv]

        m = jnp.min(d2, axis=0, keepdims=True)  # [1, nv]
        within_f = (m <= delta * delta).astype(jnp.float32)
        if weighted:
            b2 = jnp.concatenate(
                [zrow5, unx.astype(mm_dtype), uny.astype(mm_dtype),
                 unz.astype(mm_dtype), zrow120], axis=0)
            ndot = mm(b2)
            is_best = (d2 <= m).astype(jnp.float32)
            prob_best = jnp.max(prob_col * is_best, axis=0, keepdims=True)
            dot_best = jnp.max(
                jnp.abs(ndot) * is_best - (1.0 - is_best), axis=0, keepdims=True
            )
            gate_f = (dot_best >= cos_gate).astype(jnp.float32)
            contrib = within_f * gate_f * prob_best
        else:
            contrib = within_f
        partial = jnp.sum(contrib) / total_nv
        row = jnp.full((1, 128), partial, jnp.float32)
        prev = out_ref[pl.ds(hi, 1), :]
        out_ref[pl.ds(hi, 1), :] = jnp.where(j == 0, row, prev + row)
        return 0

    jax.lax.fori_loop(0, th, one_hypothesis, 0)


def _lcp_kernel_segside_hb(
    tr_ref,  # SMEM [HB, 128]: cols 0:12 = row-major (R | t) per hypothesis
    modelT_ref,  # VMEM [128, nvp]: rows 0:3 coords, 3 pad marker, 4:7 normals
    segcat_ref,  # VMEM [Ns, 128]: same pack as _lcp_kernel_segside
    out_ref,  # VMEM [HB, 128]
    *,
    delta: float,
    cos_gate: float,
    weighted: bool,
    total_nv: int,
    precision=None,
    model_tiled: bool = False,
):
    """Hypothesis-batched segment-stationary kernel.

    The per-hypothesis [Ns, 128] @ [128, nvp] matmul of _lcp_kernel_segside
    is tiny at coarse shapes (nvp=256): MXU launch latency and the b-build
    dominate (~6 ms measured for 16384 hyps vs a ~0.7 ms FLOP floor,
    scripts/r3_stage_profile.py). Here ALL HB hypotheses of the grid block
    pack side-by-side in the lane axis - b1 is [128, HB*nvp] with hypothesis
    hb's transformed model in lanes hb*nvp:(hb+1)*nvp - so each grid program
    issues ONE wide matmul, and the per-hypothesis work that remains is pure
    VPU row math. Reductions stay lane-major: min down the segment (sublane)
    axis, then per-hypothesis static lane-chunk sums.

    model_tiled=True generalizes to models wider than the lane budget: the
    grid grows a second dimension streaming model tiles of nvp lanes, each
    program scores its HB hypotheses against ONE shared model tile (still a
    single wide matmul) and partial scores accumulate into the revisited
    output block - the lane-packed analogue of _lcp_kernel_segside's tiling.
    """
    hb = tr_ref.shape[0]
    nvp = modelT_ref.shape[1]
    lowp = precision == jax.lax.Precision.DEFAULT
    mm_dtype = jnp.bfloat16 if lowp else jnp.float32

    a_seg = segcat_ref[:, :].astype(mm_dtype)  # [Ns, 128]
    prob_col = segcat_ref[:, 8:9]  # [Ns, 1]

    mx = modelT_ref[0:1, :]  # [1, nvp]
    my = modelT_ref[1:2, :]
    mz = modelT_ref[2:3, :]
    pad = modelT_ref[3:4, :]
    nx = modelT_ref[4:5, :]
    ny = modelT_ref[5:6, :]
    nz = modelT_ref[6:7, :]

    rows_ux, rows_uy, rows_uz, rows_usq = [], [], [], []
    rows_nx, rows_ny, rows_nz = [], [], []
    for hi in range(hb):
        r = [tr_ref[hi, k] for k in range(12)]
        r00, r01, r02, t0 = r[0], r[1], r[2], r[3]
        r10, r11, r12, t1 = r[4], r[5], r[6], r[7]
        r20, r21, r22, t2 = r[8], r[9], r[10], r[11]
        ux = r00 * mx + r01 * my + r02 * mz + t0
        uy = r10 * mx + r11 * my + r12 * mz + t1
        uz = r20 * mx + r21 * my + r22 * mz + t2
        rows_ux.append(-2.0 * ux)
        rows_uy.append(-2.0 * uy)
        rows_uz.append(-2.0 * uz)
        rows_usq.append(ux * ux + uy * uy + uz * uz + pad)
        if weighted:
            rows_nx.append(r00 * nx + r01 * ny + r02 * nz)
            rows_ny.append(r10 * nx + r11 * ny + r12 * nz)
            rows_nz.append(r20 * nx + r21 * ny + r22 * nz)

    wide = hb * nvp
    cat = lambda rows: jnp.concatenate(rows, axis=1).astype(mm_dtype)
    b1 = jnp.concatenate(
        [cat(rows_ux), cat(rows_uy), cat(rows_uz),
         jnp.ones((1, wide), mm_dtype), cat(rows_usq),
         jnp.zeros((123, wide), mm_dtype)], axis=0,
    )  # [128, HB*nvp]
    d2 = jax.lax.dot_general(
        a_seg, b1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [Ns, HB*nvp]

    m = jnp.min(d2, axis=0, keepdims=True)  # [1, HB*nvp]
    within_f = (m <= delta * delta).astype(jnp.float32)
    if weighted:
        b2 = jnp.concatenate(
            [jnp.zeros((5, wide), mm_dtype), cat(rows_nx), cat(rows_ny),
             cat(rows_nz), jnp.zeros((120, wide), mm_dtype)], axis=0)
        ndot = jax.lax.dot_general(
            a_seg, b2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        is_best = (d2 <= m).astype(jnp.float32)
        prob_best = jnp.max(prob_col * is_best, axis=0, keepdims=True)
        dot_best = jnp.max(
            jnp.abs(ndot) * is_best - (1.0 - is_best), axis=0, keepdims=True
        )
        gate_f = (dot_best >= cos_gate).astype(jnp.float32)
        contrib = within_f * gate_f * prob_best  # [1, HB*nvp]
    else:
        contrib = within_f

    j = pl.program_id(1) if model_tiled else 0
    for hi in range(hb):
        partial = jnp.sum(contrib[:, hi * nvp : (hi + 1) * nvp]) / total_nv
        row = jnp.full((1, 128), partial, jnp.float32)
        if model_tiled:
            prev = out_ref[pl.ds(hi, 1), :]
            row = jnp.where(j == 0, row, prev + row)
        out_ref[pl.ds(hi, 1), :] = row


@functools.partial(
    jax.jit,
    static_argnames=("delta", "normal_gate_deg", "weighted", "matmul_precision",
                     "hb_lane_pack"),
)
def lcp_scores_pallas_segside(
    transforms: jnp.ndarray,
    model_pts: jnp.ndarray,
    model_nrm: jnp.ndarray,
    seg_pts: jnp.ndarray,
    seg_nrm: jnp.ndarray,
    seg_prob: jnp.ndarray,
    seg_mask: jnp.ndarray,
    delta: float = 0.005,
    normal_gate_deg: float = 30.0,
    weighted: bool = True,
    matmul_precision: str | None = None,
    # None = auto (HB wide-matmul path only when 8 whole model tiles fit the
    # lane budget - the coarse shape). True = force the generalized
    # model-tiled HB path at any shape (grid streams model tiles, each
    # program still issues one wide matmul). False = per-hypothesis kernel.
    hb_lane_pack: bool | None = None,
) -> jnp.ndarray:
    """Segment-stationary Pallas kernel (see _lcp_kernel_segside).

    The whole segment lives in one VMEM block (Ns <= ~2048); model tiles
    stream via the grid. Identical semantics to lcp_scores_xla except the
    documented tie-break (max prob / max |ndot| across exactly-tied NN).

    Coordinates are centered at the segment centroid before packing: this
    layout multiplies ABSOLUTE positions (|s|^2, s.u), and at ~0.7 m scene
    coordinates bf16 input rounding would inject ~4e-3 of d^2 noise (160x
    delta^2); centering shrinks the operands to segment scale (~0.1 m) so
    the "default" precision stays ranking-safe (~1e-4)."""
    h = transforms.shape[0]
    nv = model_pts.shape[0]
    ns = seg_pts.shape[0]
    c = jnp.sum(jnp.where(seg_mask[:, None], seg_pts, 0.0), axis=0) / jnp.maximum(
        jnp.sum(seg_mask), 1
    )
    seg_pts = seg_pts - c
    transforms = transforms.at[:, :3, 3].add(-c)
    pad_ns = (-ns) % 128
    h_tile = 8
    pad_h = (-h) % h_tile
    # VMEM budget: d2 + ndot live blocks are [ns, lanes] f32 x2, plus the
    # [128, lanes] b1/b2 operand builds (the +256 term) - together <= ~8 MB.
    # Rounded down to a multiple of 128 (Mosaic block-shape rule).
    budget_lanes = max(512, ((1 << 20) // (ns + pad_ns + 256)) // 128 * 128)
    nv_tile = min(nv, budget_lanes)
    pad_nv = (-nv) % nv_tile

    # Hypothesis-batched fast path: when 8 whole (128-padded) model tiles fit
    # in the lane budget, the h_tile=8 block computes in ONE wide matmul
    # (see _lcp_kernel_segside_hb) instead of 8 tiny per-hypothesis ones.
    # This is the coarse-ranking shape (nv=256 after subsampling): measured
    # MXU-launch + b-build overhead dominated the per-hypothesis formulation.
    nvp128 = nv + ((-nv) % 128)
    hyp_batched = nvp128 * h_tile <= budget_lanes
    # Generalized (model-tiled) HB: pack h_tile hypotheses per program with a
    # SHARED model tile of budget_lanes/h_tile lanes streaming via a second
    # grid dimension. Needs at least one 128-lane tile per hypothesis within
    # the budget (large segments shrink it below that - fall through).
    hb_tiled = False
    if hb_lane_pack and not hyp_batched:
        hb_nv_tile = (budget_lanes // h_tile) // 128 * 128
        if hb_nv_tile >= 128:
            hb_tiled = True
            nv_tile = min(nvp128, hb_nv_tile)
            pad_nv = (-nv) % nv_tile
    if hb_lane_pack is False:
        hyp_batched = False

    tr16 = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad_h, 4, 4))], axis=0
    ).reshape(-1, 16)
    tr = jnp.zeros((tr16.shape[0], 128), jnp.float32).at[:, 0:12].set(tr16[:, 0:12])

    # Lane-major model pack: [128, Nv] rows = (x, y, z, pad, nx, ny, nz).
    model_cols = nvp128 if hyp_batched else nv + pad_nv
    modelT = jnp.zeros((128, model_cols), jnp.float32)
    modelT = (
        modelT.at[0:3, :nv].set(model_pts.T)
        .at[3, nv:].set(1e9)
        .at[4:7, :nv].set(model_nrm.T)
    )
    segcat = jnp.zeros((ns + pad_ns, 128), jnp.float32)
    seg_sq = jnp.sum(seg_pts * seg_pts, axis=-1)
    segcat = (
        segcat.at[:ns, 0:3].set(seg_pts)
        .at[:ns, 3].set(jnp.where(seg_mask, seg_sq, 1e9))
        .at[ns:, 3].set(1e9)
        .at[:, 4].set(1.0)
        .at[:ns, 5:8].set(seg_nrm)
        .at[:ns, 8].set(seg_prob)
    )

    if hyp_batched:
        out = pl.pallas_call(
            functools.partial(
                _lcp_kernel_segside_hb,
                delta=delta,
                cos_gate=math.cos(math.radians(normal_gate_deg)),
                weighted=weighted,
                total_nv=nv,
                # The HB kernel has no high3 path (only the exact tier uses
                # high3, and its nv=4096 never hyp-batches); degrade to the
                # strictly-more-precise HIGHEST if it ever lands here.
                precision=(jax.lax.Precision.HIGHEST
                           if matmul_precision == "high3"
                           else _PRECISIONS[matmul_precision]),
            ),
            out_shape=jax.ShapeDtypeStruct((h + pad_h, 128), jnp.float32),
            grid=((h + pad_h) // h_tile,),
            in_specs=[
                pl.BlockSpec((h_tile, 128), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((128, nvp128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ns + pad_ns, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (h_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(tr, modelT, segcat)
        return out[:h, 0]

    if hb_tiled:
        out = pl.pallas_call(
            functools.partial(
                _lcp_kernel_segside_hb,
                delta=delta,
                cos_gate=math.cos(math.radians(normal_gate_deg)),
                weighted=weighted,
                total_nv=nv,
                precision=(jax.lax.Precision.HIGHEST
                           if matmul_precision == "high3"
                           else _PRECISIONS[matmul_precision]),
                model_tiled=True,
            ),
            out_shape=jax.ShapeDtypeStruct((h + pad_h, 128), jnp.float32),
            grid=((h + pad_h) // h_tile, (nv + pad_nv) // nv_tile),
            in_specs=[
                pl.BlockSpec((h_tile, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((128, nv_tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ns + pad_ns, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (h_tile, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        )(tr, modelT, segcat)
        return out[:h, 0]

    out = pl.pallas_call(
        functools.partial(
            _lcp_kernel_segside,
            delta=delta,
            cos_gate=math.cos(math.radians(normal_gate_deg)),
            weighted=weighted,
            total_nv=nv,
            precision=_PRECISIONS[matmul_precision],
        ),
        out_shape=jax.ShapeDtypeStruct((h + pad_h, 128), jnp.float32),
        grid=((h + pad_h) // h_tile, (nv + pad_nv) // nv_tile),
        in_specs=[
            # Transforms in SMEM: the kernel reads them as scalars.
            pl.BlockSpec((h_tile, 128), lambda i, j: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((128, nv_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ns + pad_ns, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (h_tile, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
    )(tr, modelT, segcat)
    return out[:h, 0]
