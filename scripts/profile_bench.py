"""Stage-level profiling of the bench workload on the current backend.

NOTE: jax.block_until_ready is a no-op on the axon TPU backend - every
timing here synchronizes by fetching one scalar from the result instead.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from physimglobalpose_tpu.ops import icp, lcp, scoring


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    _sync(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs()
    )
    on_tpu = jax.default_backend() == "tpu"
    h = tfs.shape[0]
    k = 1024

    print(f"backend            : {jax.default_backend()}   H={h}")

    # The actual bench pipeline stages, at bench shapes.
    coarse_pts, coarse_nrm = model_v[::8], nrm_v[::8]  # coarse_subsample=8
    t_coarse = timeit(
        lcp.lcp_scores, tfs, coarse_pts, coarse_nrm, seg, seg_nrm, seg_prob,
        seg_mask, weighted=True, use_pallas=on_tpu,
    )
    print(f"coarse LCP @512 xH : {t_coarse*1e3:9.1f} ms  ({h/t_coarse:9.0f} hyp/s)")

    top_tfs = tfs[:k]
    t_icp = timeit(
        icp.refine_icp, top_tfs, model_m[::2], nrm_m[::2], seg, seg_mask,
        iters=bench.ICP_ITERS, point_to_plane=True,
    )
    print(f"ICP {bench.ICP_ITERS}it @512 x{k} : {t_icp*1e3:9.1f} ms")

    t_fine = timeit(
        lcp.lcp_scores, top_tfs, model_v, nrm_v, seg, seg_nrm, seg_prob,
        seg_mask, weighted=True, use_pallas=on_tpu,
    )
    print(f"fine LCP @4k x{k}  : {t_fine*1e3:9.1f} ms")

    t_pipe = timeit(
        scoring.score_refine_pipeline, tfs, model_m, nrm_m, model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask,
        top_k=k, coarse_subsample=8, icp_iters=bench.ICP_ITERS,
        icp_subsample=2, use_pallas=on_tpu,
    )
    print(f"full pipeline      : {t_pipe*1e3:9.1f} ms  ({h/t_pipe:9.0f} hyp/s)")
    print(f"stage sum          : {(t_coarse+t_icp+t_fine)*1e3:9.1f} ms")

    if on_tpu:
        # Kernel variants on the fine-LCP shape (the MXU-heavy stage).
        t_xla = timeit(
            lcp.lcp_scores_xla, top_tfs, model_v, nrm_v, seg, seg_nrm,
            seg_prob, seg_mask, weighted=True, h_chunk=64,
        )
        print(f"fine LCP xla       : {t_xla*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
