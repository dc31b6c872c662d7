"""Pipeline shrink experiments: top_k and icp_seg_stride vs quality.

The reference verifies ~100 hypotheses per object total
(match4pcsBase.cc:290-291,1858) and the product consumes the top-25; the
bench's top_k=512 refine budget is generous. Measures, on the clutter
workload (pipelined like bench.py): throughput + exact-top-64 survival into
the production coarse ranking + top-1 drift vs the exact pipeline, for
(top_k, icp_seg_stride) variants.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from physimglobalpose_tpu.ops import lcp, scoring


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0])).ravel()[:1]


def main():
    on_tpu = jax.default_backend() == "tpu"
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs(clutter=True)
    )
    h = tfs.shape[0]
    print(f"backend {jax.default_backend()} H={h} clutter")

    exact = scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask,
        top_k=512, coarse_subsample=8, icp_iters=6, icp_subsample=2,
        use_pallas=on_tpu, icp_nn_refresh=2,
    )
    exact_coarse = np.asarray(exact.coarse_scores)
    exact_top64 = set(np.argsort(-exact_coarse)[:64].tolist())
    t_exact = np.asarray(exact.top_transforms[0][:3, 3])

    def run(top_k, icp_ss):
        kw = dict(
            top_k=top_k, coarse_subsample=16, coarse_seg_stride=2,
            icp_iters=6, icp_subsample=2, use_pallas=on_tpu,
            coarse_precision="default" if on_tpu else None,
            fine_precision="default" if on_tpu else None,
            coarse_weighted=False, fine_exact_k=64,
            icp_precision="default" if on_tpu else None,
            icp_seg_stride=icp_ss, icp_nn_refresh=2,
        )

        def step(t):
            return scoring.score_refine_pipeline(
                t, model_m, nrm_m, model_v, nrm_v,
                seg, seg_nrm, seg_prob, seg_mask, **kw)

        out = step(tfs)
        _sync(out.top_scores)
        pipe = 4
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
        topk_set = set(np.argsort(-coarse)[:top_k].tolist())
        surv = len(exact_top64 & topk_set)
        drift = float(np.linalg.norm(np.asarray(out.top_transforms[0][:3, 3]) - t_exact))
        print(f"top_k={top_k:4d} icp_ss={icp_ss}: {best*1e3:7.1f} ms/batch "
              f"({h/best:9.0f} hyp/s) survival {surv}/64 "
              f"top1_drift={drift*1000:.2f} mm")

    for top_k, icp_ss in ((512, 1), (512, 2), (256, 1), (256, 2), (128, 2)):
        run(top_k, icp_ss)


if __name__ == "__main__":
    main()
