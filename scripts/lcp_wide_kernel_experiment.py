"""EXPERIMENTAL model-stationary wide-N LCP kernel (moved out of ops/lcp.py).

Status: crashes the Mosaic compiler subprocess on v5e with zero diagnostics.
Bisection notes (round 2, on hardware):
- Hoisting the 96 per-hypothesis transform scalar reads outside the segment
  fori_loop blew Mosaic's scalar allocation (compiler subprocess crash);
  keeping them inside the loop compiles further.
- Sub-128 lane shapes in loop carries / concatenates crash Mosaic; the
  carries here are lane-padded to 128 to work around it.
- A fused 3-operand boolean where crashed the compiler; replaced with
  multiplicative float gates.
- Even with all three workarounds the kernel still dies at ns_tile=128,
  TH=8, nv_tile=1024 on v5e.

The production segment-stationary kernel (ops/lcp.py lcp_scores_pallas_segside
and the hypothesis-batched variant) made this layout redundant as a perf
lever: it achieves the wide-MXU-launch goal without concatenating
per-hypothesis b-matrices. Kept here in case a future Mosaic release fixes
the crash and the model-stationary orientation becomes interesting again
(it is the only layout that streams arbitrarily large segments).

Usage: python scripts/lcp_wide_kernel_experiment.py  (runs one small shape
on the current backend and compares against ops.lcp.lcp_scores_xla).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import math

from physimglobalpose_tpu import _jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physimglobalpose_tpu.ops import lcp as lcp_mod


def _lcp_kernel_wide(
    tr_ref,  # VMEM [TH, 128]
    model_ref,  # VMEM [nv_tile, 128]
    segcat_ref,  # VMEM [Ns, 128]
    out_ref,  # VMEM [TH, 128]
    *,
    ns_tile: int,
    delta: float,
    cos_gate: float,
    weighted: bool,
    total_nv: int,
    precision=None,
):
    """Wide-N variant: all TH hypotheses share one matmul per segment tile.

    b-matrices of the TH hypotheses concatenate along rows, so the distance
    and normal-dot for the whole hypothesis tile come from two
    [nv_tile, 128] @ [128, TH*ns_tile] matmuls - 8x fewer, 8x wider MXU
    launches than the per-hypothesis loop.
    """
    th = tr_ref.shape[0]
    nv_tile = model_ref.shape[0]
    ns = segcat_ref.shape[0]
    big = jnp.float32(1e9)
    j = pl.program_id(1)

    a_pos = model_ref[:, :]

    def seg_tile(si, carry):
        run_min, run_prob, run_dot = carry  # [nv_tile, TH] each
        rows = pl.ds(si * ns_tile, ns_tile)
        sx = segcat_ref[rows, 0:1]
        sy = segcat_ref[rows, 1:2]
        sz = segcat_ref[rows, 2:3]
        nx = segcat_ref[rows, 3:4]
        ny = segcat_ref[rows, 4:5]
        nz = segcat_ref[rows, 5:6]
        sprob = segcat_ref[rows, 6:7]
        smask = segcat_ref[rows, 7:8]
        ones = jnp.ones((ns_tile, 1), jnp.float32)
        z3 = jnp.zeros((ns_tile, 3), jnp.float32)
        ztail = jnp.zeros((ns_tile, 128 - 11), jnp.float32)
        z8 = jnp.zeros((ns_tile, 8), jnp.float32)

        b1_blocks = []
        b2_blocks = []
        for hi in range(th):
            # scalar reads INSIDE the loop: hoisting 96 of them outside blew
            # Mosaic's scalar allocation (compiler subprocess crash).
            r = [tr_ref[hi, k] for k in range(12)]
            r00, r01, r02, t0 = r[0], r[1], r[2], r[3]
            r10, r11, r12, t1 = r[4], r[5], r[6], r[7]
            r20, r21, r22, t2 = r[8], r[9], r[10], r[11]
            dx = sx - t0
            dy = sy - t1
            dz = sz - t2
            qx = r00 * dx + r10 * dy + r20 * dz
            qy = r01 * dx + r11 * dy + r21 * dz
            qz = r02 * dx + r12 * dy + r22 * dz
            c = dx * dx + dy * dy + dz * dz
            c = jnp.where(smask > 0.5, c, big)
            bnx = r00 * nx + r10 * ny + r20 * nz
            bny = r01 * nx + r11 * ny + r21 * nz
            bnz = r02 * nx + r12 * ny + r22 * nz
            b1_blocks.append(
                jnp.concatenate([-2.0 * qx, -2.0 * qy, -2.0 * qz, ones, c, z3,
                                 jnp.zeros((ns_tile, 3), jnp.float32), ztail], axis=1)
            )
            b2_blocks.append(
                jnp.concatenate([z8, bnx, bny, bnz, ztail], axis=1)
            )
        b1 = jnp.concatenate(b1_blocks, axis=0)  # [TH*ns_tile, 128]
        b2 = jnp.concatenate(b2_blocks, axis=0)

        d2 = jax.lax.dot_general(
            a_pos, b1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [nv_tile, TH*ns_tile]
        ndot = jax.lax.dot_general(
            a_pos, b2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

        mins, probs, dots = [], [], []
        for hi in range(th):
            cols = slice(hi * ns_tile, (hi + 1) * ns_tile)
            d2h = d2[:, cols]
            tile_min = jnp.min(d2h, axis=-1, keepdims=True)
            is_best = d2h <= tile_min
            prob_row = jnp.broadcast_to(sprob[:, 0][None, :], d2h.shape)
            mins.append(tile_min)
            probs.append(
                jnp.max(jnp.where(is_best, prob_row, -1.0), axis=-1, keepdims=True)
            )
            dots.append(
                jnp.max(jnp.where(is_best, jnp.abs(ndot[:, cols]), -1.0),
                        axis=-1, keepdims=True)
            )
        # Lane-pad the carries to 128 (sub-128 lane shapes crash Mosaic).
        padf = jnp.full((nv_tile, 128 - th), big, jnp.float32)
        padz = jnp.zeros((nv_tile, 128 - th), jnp.float32)
        tile_min = jnp.concatenate(mins + [padf], axis=1)  # [nv_tile, 128]
        tile_prob = jnp.concatenate(probs + [padz], axis=1)
        tile_dot = jnp.concatenate(dots + [padz], axis=1)
        better = tile_min < run_min
        return (
            jnp.where(better, tile_min, run_min),
            jnp.where(better, tile_prob, run_prob),
            jnp.where(better, tile_dot, run_dot),
        )

    init = (
        jnp.full((nv_tile, 128), big, jnp.float32),
        jnp.zeros((nv_tile, 128), jnp.float32),
        jnp.zeros((nv_tile, 128), jnp.float32),
    )
    run_min, run_prob, run_dot = jax.lax.fori_loop(0, ns // ns_tile, seg_tile, init)
    within_f = (run_min <= delta * delta).astype(jnp.float32)
    if weighted:
        # multiplicative gates instead of a fused 3-operand boolean where
        # (the fused form crashes the Mosaic compiler on v5e)
        gate_f = (run_dot >= cos_gate).astype(jnp.float32)
        contrib = within_f * gate_f * run_prob
    else:
        contrib = within_f
    partial = jnp.sum(contrib, axis=0, keepdims=True) / total_nv  # [1, 128]
    rows = jnp.concatenate(
        [jnp.full((1, 128), partial[0, hi], jnp.float32) for hi in range(th)], axis=0
    )
    prev = out_ref[:, :]
    out_ref[:, :] = jnp.where(j == 0, rows, prev + rows)


@functools.partial(
    jax.jit,
    static_argnames=("delta", "normal_gate_deg", "weighted", "matmul_precision"),
)
def lcp_scores_pallas_wide(
    transforms, model_pts, model_nrm, seg_pts, seg_nrm, seg_prob, seg_mask,
    delta=0.005, normal_gate_deg=30.0, weighted=True, matmul_precision=None,
):
    h = transforms.shape[0]
    nv = model_pts.shape[0]
    ns = seg_pts.shape[0]
    ns_tile = 128  # lane-aligned slices; concat width = TH*128 = 1024
    pad_ns = (-ns) % ns_tile
    h_tile = 8
    pad_h = (-h) % h_tile
    nv_tile = min(nv, 1024)
    pad_nv = (-nv) % nv_tile

    tr16 = jnp.concatenate(
        [transforms, jnp.broadcast_to(jnp.eye(4), (pad_h, 4, 4))], axis=0
    ).reshape(-1, 16)
    tr = jnp.zeros((tr16.shape[0], 128), jnp.float32).at[:, 0:12].set(tr16[:, 0:12])
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
        segcat.at[:ns, 0:3].set(seg_pts)
        .at[:ns, 3:6].set(seg_nrm)
        .at[:ns, 6].set(seg_prob)
        .at[:ns, 7].set(seg_mask.astype(jnp.float32))
    )
    out = pl.pallas_call(
        functools.partial(
            _lcp_kernel_wide,
            ns_tile=min(ns_tile, ns + pad_ns),
            delta=delta,
            cos_gate=math.cos(math.radians(normal_gate_deg)),
            weighted=weighted,
            total_nv=nv,
            precision=lcp_mod._PRECISIONS[matmul_precision],
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


def main():
    rng = np.random.default_rng(0)
    model = rng.uniform(-0.06, 0.06, size=(512, 3)).astype(np.float32)
    nrm = rng.normal(size=(512, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    seg = model[:256] + np.array([0.05, 0.0, 0.6], np.float32)
    seg_nrm = nrm[:256]
    prob = rng.uniform(0.5, 1.0, size=256).astype(np.float32)
    mask = np.ones(256, bool)
    tfs = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))
    tfs[:, :3, 3] = [0.05, 0.0, 0.6] + rng.normal(scale=0.01, size=(16, 3))
    args = [jnp.asarray(a) for a in (tfs, model, nrm, seg, seg_nrm, prob, mask)]
    ref = lcp_mod.lcp_scores_xla(*args)
    got = lcp_scores_pallas_wide(*args)
    print("max |ds| vs xla:", float(jnp.max(jnp.abs(ref - got))))


if __name__ == "__main__":
    main()
