"""Coarse-stage shrink experiments: NV subsample x segment stride vs quality.

The stage profile (scripts/r3_stage_profile.py) puts coarse as the largest
kernel (~6 ms of the ~19 ms kernel budget at the production flags). This
measures, on the clutter workload, throughput (pipe=8 like the updated
bench) + exact-top-64 survival into the coarse top-256 + top-1 drift vs the
exact pipeline for (coarse_subsample, coarse_seg_stride) variants.
Production ships (16, 2) = NV 256 / seg 512.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import numpy as np

import bench
from physimglobalpose_tpu.ops import scoring


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0])).ravel()[:1]


def main():
    on_tpu = jax.default_backend() == "tpu"
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs(clutter=True)
    )
    h = tfs.shape[0]
    print(f"backend {jax.default_backend()} H={h} clutter pipe=8")

    exact = scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask,
        top_k=512, coarse_subsample=8, icp_iters=6, icp_subsample=2,
        use_pallas=on_tpu, icp_nn_refresh=2,
    )
    exact_coarse = np.asarray(exact.coarse_scores)
    exact_top64 = set(np.argsort(-exact_coarse)[:64].tolist())
    t_exact = np.asarray(exact.top_transforms[0][:3, 3])

    def run(css, cstride):
        kw = dict(
            top_k=256, coarse_subsample=css, coarse_seg_stride=cstride,
            icp_iters=6, icp_subsample=2, use_pallas=on_tpu,
            coarse_precision="default" if on_tpu else None,
            fine_precision="default" if on_tpu else None,
            coarse_weighted=False, fine_exact_k=64,
            icp_precision="default" if on_tpu else None,
            icp_nn_refresh=2,
        )

        def step(t):
            return scoring.score_refine_pipeline(
                t, model_m, nrm_m, model_v, nrm_v,
                seg, seg_nrm, seg_prob, seg_mask, **kw)

        out = step(tfs)
        _sync(out.top_scores)
        pipe = 8
        best = float("inf")
        for i in range(4):
            batches = [tfs.at[:, 0, 3].add(1e-6 * (i * pipe + p + 1)) for p in range(pipe)]
            _sync(batches[-1])
            t0 = time.perf_counter()
            acc = 0.0
            for b in batches:
                o = step(b)
                acc = acc + o.top_scores[0]
            _sync(acc)
            best = min(best, (time.perf_counter() - t0) / pipe)
        coarse = np.asarray(out.coarse_scores)
        topk_set = set(np.argsort(-coarse)[:256].tolist())
        surv = len(exact_top64 & topk_set)
        drift = float(np.linalg.norm(np.asarray(out.top_transforms[0][:3, 3]) - t_exact))
        print(f"css={css:3d} (NV={4096//css:4d}) seg_stride={cstride}: "
              f"{best*1e3:7.1f} ms/batch ({h/best:9.0f} hyp/s) "
              f"survival {surv}/64 top1_drift={drift*1000:.2f} mm")

    for css, cstride in ((16, 2), (32, 2), (16, 4), (32, 4), (64, 2)):
        run(css, cstride)


if __name__ == "__main__":
    main()
