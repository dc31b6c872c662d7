"""Stage-level profiling of the bench workload on the current backend."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp

import bench
from physimglobalpose_tpu.ops import icp, lcp


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs()
    )
    on_tpu = jax.default_backend() == "tpu"
    h = tfs.shape[0]

    t_lcp_pallas = timeit(
        lcp.lcp_scores_pallas, tfs, model_v, nrm_v, seg, seg_nrm, seg_prob,
        seg_mask, weighted=True,
    ) if on_tpu else float("nan")
    t_lcp_xla = timeit(
        lcp.lcp_scores_xla, tfs, model_v, nrm_v, seg, seg_nrm, seg_prob,
        seg_mask, weighted=True, h_chunk=64,
    )
    t_icp_10 = timeit(
        icp.refine_icp, tfs, model_m, nrm_m, seg, seg_mask,
        iters=bench.ICP_ITERS, point_to_plane=True,
    )
    t_icp_1 = timeit(
        icp.refine_icp, tfs, model_m, nrm_m, seg, seg_mask,
        iters=1, point_to_plane=True,
    )
    print(f"backend            : {jax.default_backend()}")
    print(f"H                  : {h}")
    print(f"lcp pallas         : {t_lcp_pallas*1e3:9.1f} ms  ({h/t_lcp_pallas:9.0f} hyp/s)" if on_tpu else "lcp pallas        : skipped (cpu)")
    print(f"lcp xla            : {t_lcp_xla*1e3:9.1f} ms  ({h/t_lcp_xla:9.0f} hyp/s)")
    print(f"icp {bench.ICP_ITERS:2d} iters       : {t_icp_10*1e3:9.1f} ms  ({h/t_icp_10:9.0f} hyp/s)")
    print(f"icp  1 iter        : {t_icp_1*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
