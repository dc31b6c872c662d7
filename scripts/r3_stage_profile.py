"""Stage split of the PRODUCTION bench pipeline (r3 flags) + pipe sweep.

Two questions this answers on the chip:
1. Where does the 29 ms/batch go at the production flags (top_k=256,
   coarse NV=256/seg2 bf16 unweighted, segside bf16 ICP, two-tier fine)?
2. How much more does deeper dispatch pipelining buy (pipe=4 -> 8 -> 16)?
   The axon tunnel costs a fixed ~31 ms per dependent fetch
   (scripts/r3_lcp_micro.py overhead_probe); bench.py amortizes it over
   pipe=4 batches.

Every timing here pipelines PIPE dispatches per fetch, like bench.py, so
the numbers are per-batch steady state (not dispatch-dominated).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from physimglobalpose_tpu.ops import icp as icp_mod
from physimglobalpose_tpu.ops import lcp as lcp_mod
from physimglobalpose_tpu.ops import scoring

PIPE = 4
REPS = 5


def timed_pipeline(fn, tfs, pipe=PIPE, reps=REPS):
    """Best per-batch time over reps, each enqueueing `pipe` dependent-input
    variants and fetching one scalar that depends on all of them."""
    out = fn(tfs)
    float(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for i in range(reps):
        batches = [
            tfs.at[:, 0, 3].add(1e-6 * (i * pipe + p + 1)) for p in range(pipe)
        ]
        float(batches[-1][0, 0, 0])
        t0 = time.perf_counter()
        acc = 0.0
        for b in batches:
            out = fn(b)
            acc = acc + jax.tree.leaves(out)[0].ravel()[0]
        float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / pipe


def main():
    on_tpu = jax.default_backend() == "tpu"
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs()
    )
    h = tfs.shape[0]
    k = 256
    print(f"backend={jax.default_backend()} H={h} top_k={k} pipe={PIPE}")

    prod = dict(
        top_k=k, coarse_subsample=16, coarse_seg_stride=4,
        icp_iters=bench.ICP_ITERS, icp_subsample=2,
        use_pallas=on_tpu,
        coarse_precision="default" if on_tpu else None,
        icp_nn_refresh=2, coarse_weighted=False,
        fine_precision="default" if on_tpu else None,
        fine_exact_k=64, fine_seg_stride=4 if on_tpu else 1,
        icp_precision="default" if on_tpu else None,
    )

    # --- stage: coarse (production flags) ---
    coarse_pts, coarse_nrm = model_v[::16], nrm_v[::16]
    c_seg, c_nrm = seg[::4], seg_nrm[::4]
    c_prob, c_mask = seg_prob[::4], seg_mask[::4]

    @jax.jit
    def coarse_fn(t):
        return lcp_mod.lcp_scores(
            t, coarse_pts, coarse_nrm, c_seg, c_nrm, c_prob, c_mask,
            weighted=False, use_pallas=on_tpu,
            matmul_precision="default" if on_tpu else None,
        )

    t_coarse = timed_pipeline(coarse_fn, tfs)
    print(f"coarse bf16 NV=256/seg4 xH : {t_coarse*1e3:7.2f} ms/batch")

    # --- stage: ICP segside bf16 on top-256 ---
    top_tfs = tfs[:k]
    icp_pts, icp_nrm = model_m[::2], nrm_m[::2]

    @jax.jit
    def icp_fn(t):
        if on_tpu:
            return icp_mod.refine_icp_pallas_segside(
                t, icp_pts, icp_nrm, seg, seg_mask,
                iters=bench.ICP_ITERS, matmul_precision="default",
            )
        return icp_mod.refine_icp(
            t, icp_pts, icp_nrm, seg, seg_mask,
            iters=bench.ICP_ITERS, point_to_plane=True, nn_refresh=2,
        )

    t_icp = timed_pipeline(icp_fn, top_tfs)
    print(f"ICP 6it bf16 x{k}          : {t_icp*1e3:7.2f} ms/batch")

    # --- stage: fine bulk bf16 @4k x256 ---
    @jax.jit
    def fine_fn(t):
        return lcp_mod.lcp_scores(
            t, model_v, nrm_v,
            seg[::4], seg_nrm[::4], seg_prob[::4], seg_mask[::4],
            weighted=True, use_pallas=on_tpu,
            matmul_precision="default" if on_tpu else None,
        )

    t_fine = timed_pipeline(fine_fn, top_tfs)
    print(f"fine bulk bf16 @4k/seg4 x{k}: {t_fine*1e3:6.2f} ms/batch")

    # --- stage: exact fp32 @4k x64 ---
    @jax.jit
    def exact_fn(t):
        return lcp_mod.lcp_scores(
            t[:64], model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask,
            weighted=True, use_pallas=on_tpu,
        )

    t_exact = timed_pipeline(exact_fn, top_tfs)
    print(f"exact f32 @4k x64          : {t_exact*1e3:7.2f} ms/batch")

    # --- full production pipeline at several pipe depths ---
    def pipe_fn(t):
        out = scoring.score_refine_pipeline(
            t, model_m, nrm_m, model_v, nrm_v,
            seg, seg_nrm, seg_prob, seg_mask, **prod,
        )
        return out.top_scores

    for pipe in (1, 2, 4, 8, 16):
        t_pipe = timed_pipeline(pipe_fn, tfs, pipe=pipe, reps=3)
        print(
            f"full pipeline pipe={pipe:2d}      : {t_pipe*1e3:7.2f} ms/batch"
            f"  ({h/t_pipe:9.0f} hyp/s)"
        )
    print(f"stage sum (pipe={PIPE})        : "
          f"{(t_coarse+t_icp+t_fine+t_exact)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
