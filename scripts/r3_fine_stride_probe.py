"""Measure the fine_seg_stride lever: stride the BULK fine tier's segment.

The fine bulk tier (bf16 weighted LCP @ NV=4096 x 256 hyps, ~3.6 ms/batch at
pipe=4) only ranks the ICP-refined survivors down to the exact fp32 top-64;
its d2 block is [Ns, NV], so striding the SEGMENT side halves its matmuls the
same way coarse_seg_stride=4 did for the ranking pass. The exact tier then
rescores the winners at FULL resolution, so reported scores never change -
only which near-ties make the top-64 cut.

Gates (vs the fully-exact pipeline, both bench workloads):
  - top-1 translation drift < 2 mm;
  - easy: winner's exact-f32 fine score gap < 0.002;
  - sorted top-25 exact scores (what the product consumes) match the
    unstrided production pipeline within 1e-3.

Run on the chip:  python scripts/r3_fine_stride_probe.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import numpy as np

import bench
from physimglobalpose_tpu.ops import scoring


def run_prod(inputs, fine_seg_stride, on_tpu=True):
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = inputs
    return scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask,
        top_k=256, coarse_subsample=16, coarse_seg_stride=4,
        icp_iters=bench.ICP_ITERS, icp_subsample=2, use_pallas=on_tpu,
        coarse_precision="default" if on_tpu else None, coarse_weighted=False,
        fine_precision="default" if on_tpu else None, fine_exact_k=64,
        icp_precision="default" if on_tpu else None, icp_nn_refresh=2,
        fine_seg_stride=fine_seg_stride,
    )


def run_exact(inputs, on_tpu=True):
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = inputs
    return scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask,
        top_k=512, coarse_subsample=8, icp_iters=bench.ICP_ITERS,
        icp_subsample=2, use_pallas=on_tpu, icp_nn_refresh=2,
    )


def throughput(inputs, fine_seg_stride, pipe=16, reps=3, on_tpu=True):
    tfs = inputs[0]
    out = run_prod(inputs, fine_seg_stride, on_tpu)
    float(out.top_scores[0])  # compile + settle
    best = float("inf")
    for i in range(reps):
        batches = [
            tfs.at[:, 0, 3].add(1e-6 * (i * pipe + p + 1)) for p in range(pipe)
        ]
        float(batches[-1][0, 0, 0])
        t0 = time.perf_counter()
        acc = 0.0
        for b in batches:
            o = run_prod((b,) + inputs[1:], fine_seg_stride, on_tpu)
            acc = acc + o.top_scores[0]
        float(acc)
        best = min(best, time.perf_counter() - t0)
    return tfs.shape[0] / (best / pipe)


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()}")
    for clutter in (False, True):
        name = "clutter" if clutter else "easy"
        inputs = bench.make_inputs(clutter=clutter)
        exact = run_exact(inputs, on_tpu)
        base = run_prod(inputs, 1, on_tpu)
        t_exact = np.asarray(exact.top_transforms[0][:3, 3])
        base25 = np.sort(np.asarray(base.top_scores[:25]))[::-1]
        for s in (1, 2, 4):
            out = run_prod(inputs, s, on_tpu)
            drift = float(
                np.linalg.norm(np.asarray(out.top_transforms[0][:3, 3]) - t_exact)
            )
            gap = float(exact.top_scores[0]) - float(out.top_scores[0])
            s25 = np.sort(np.asarray(out.top_scores[:25]))[::-1]
            d25 = float(np.abs(s25 - base25).max())
            print(
                f"[{name}] stride={s}: top-1 drift {drift*1e3:6.2f} mm, "
                f"winner score gap {gap:+.4f}, top-25 exact-score max diff "
                f"vs stride1 {d25:.4f}"
            )
        if not clutter:
            for s in (1, 2, 4):
                hps = throughput(inputs, s, on_tpu=on_tpu)
                print(f"[easy] stride={s}: {hps:9.0f} hyp/s (pipe=16)")


if __name__ == "__main__":
    main()
