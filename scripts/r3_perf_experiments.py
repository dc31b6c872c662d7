"""Round-3 TPU measurements: segment-stationary ICP kernel + bench stage split.

Measures, at the exact bench configuration (H=16384, top_k=512, NV=4096,
NS=1024, coarse_subsample=8, icp_subsample=2):
- each production stage as the bench runs it (bf16 unweighted coarse, ICP,
  two-tier fine) - the r2 profile script measured the exact/weighted
  variants instead, which hid the real split;
- the new Pallas segside ICP kernel vs the XLA formulation, at matmul
  precisions highest/high/default, with accuracy (pose drift vs the XLA
  fp32 path) for each;
- the full pipeline with the winning combination.

NOTE: jax.block_until_ready is a no-op on the axon TPU backend - every
timing here synchronizes by fetching one scalar from the result.
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
    return best, out


def cloud_drift(tfs_a, tfs_b, model):
    """Mean model-cloud displacement between two pose sets [H,4,4], meters."""
    a = np.einsum("hij,nj->hni", tfs_a[:, :3, :3], model) + tfs_a[:, None, :3, 3]
    b = np.einsum("hij,nj->hni", tfs_b[:, :3, :3], model) + tfs_b[:, None, :3, 3]
    return float(np.mean(np.linalg.norm(a - b, axis=-1)))


def main():
    on_tpu = jax.default_backend() == "tpu"
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs(clutter=True)
    )
    h = tfs.shape[0]
    k = 512
    print(f"backend {jax.default_backend()}  H={h}  (clutter workload)")

    # --- bench-config stages ---
    coarse_pts, coarse_nrm = model_v[::8], nrm_v[::8]
    t, coarse_out = timeit(
        lcp.lcp_scores, tfs, coarse_pts, coarse_nrm, seg, seg_nrm, seg_prob,
        seg_mask, weighted=False, use_pallas=on_tpu,
        matmul_precision="default" if on_tpu else None,
    )
    print(f"coarse bf16 unweighted @512 xH : {t*1e3:8.1f} ms ({h/t:9.0f} hyp/s)")

    top_tfs = tfs[:k]
    icp_pts, icp_nrm = model_m[::2], nrm_m[::2]

    t_xla, out_xla = timeit(
        icp.refine_icp, top_tfs, icp_pts, icp_nrm, seg, seg_mask,
        iters=6, point_to_plane=True, nn_refresh=2,
    )
    ref_tfs = np.asarray(out_xla)
    print(f"ICP XLA 6it nn2 @512 x{k}      : {t_xla*1e3:8.1f} ms")

    model_np = np.asarray(icp_pts)
    for prec in (None, "default"):
        for iters in (4, 6):
            try:
                t, out = timeit(
                    icp.refine_icp_pallas_segside, top_tfs, icp_pts, icp_nrm,
                    seg, seg_mask, iters=iters, matmul_precision=prec,
                )
                d = cloud_drift(np.asarray(out), ref_tfs, model_np)
                print(f"ICP segside {str(prec):8s} {iters}it    : {t*1e3:8.1f} ms "
                      f"drift_vs_xla={d*1000:.2f} mm")
            except Exception as e:
                print(f"ICP segside {str(prec):8s} {iters}it    : FAILED "
                      f"({type(e).__name__}: {str(e)[:100]})")

    t, _ = timeit(
        lcp.lcp_scores, jnp.asarray(ref_tfs), model_v, nrm_v, seg, seg_nrm,
        seg_prob, seg_mask, weighted=True, use_pallas=on_tpu,
        matmul_precision="default" if on_tpu else None,
    )
    print(f"fine bf16 @4k x{k}             : {t*1e3:8.1f} ms")
    t, _ = timeit(
        lcp.lcp_scores, jnp.asarray(ref_tfs[:64]), model_v, nrm_v, seg, seg_nrm,
        seg_prob, seg_mask, weighted=True, use_pallas=on_tpu,
    )
    print(f"fine exact @4k x64             : {t*1e3:8.1f} ms")

    # --- full pipeline: r2 config vs new ICP kernel ---
    combos = [
        ("r2 (XLA icp nn2)", dict(use_pallas=on_tpu, icp_nn_refresh=2,
                                  coarse_precision="default" if on_tpu else None,
                                  fine_precision="default" if on_tpu else None,
                                  coarse_weighted=False, fine_exact_k=64,
                                  icp_precision=None),  # <- no pallas ICP
         dict(force_xla_icp=True)),
        ("segside icp exact 6it", dict(use_pallas=on_tpu, icp_nn_refresh=2,
                                      coarse_precision="default" if on_tpu else None,
                                      fine_precision="default" if on_tpu else None,
                                      coarse_weighted=False, fine_exact_k=64,
                                      icp_precision=None), {}),
        ("segside icp default 6it", dict(use_pallas=on_tpu, icp_nn_refresh=2,
                                         coarse_precision="default" if on_tpu else None,
                                         fine_precision="default" if on_tpu else None,
                                         coarse_weighted=False, fine_exact_k=64,
                                         icp_precision="default"), {}),
    ]
    base_top = None
    for name, kw, flags in combos:
        if flags.get("force_xla_icp"):
            # The r2 configuration: dispatch ICP to the XLA path by lying
            # about the backend for stage 2 only is not possible through the
            # public API; instead measure with use_pallas=True but note the
            # pipeline now routes ICP to the new kernel. For the true r2
            # number see BENCH_r02.json (199.8k).
            continue
        try:
            t, out = timeit(
                scoring.score_refine_pipeline, tfs, model_m, nrm_m, model_v, nrm_v,
                seg, seg_nrm, seg_prob, seg_mask,
                top_k=k, coarse_subsample=8, icp_iters=6, icp_subsample=2, **kw,
            )
        except Exception as e:
            print(f"pipeline {name:24s}: FAILED ({type(e).__name__}: {str(e)[:100]})")
            continue
        best_t = np.asarray(out.top_transforms[0][:3, 3])
        s0 = float(out.top_scores[0])
        if base_top is None:
            base_top = best_t
        drift = np.linalg.norm(best_t - base_top)
        print(f"pipeline {name:24s}: {t*1e3:8.1f} ms ({h/t:9.0f} hyp/s) "
              f"top1_score={s0:.4f} top1_drift={drift*1000:.2f} mm")


if __name__ == "__main__":
    main()
