"""One-off TPU measurements for the scoring-pipeline perf levers.

Measures (bench shapes, H=16384):
- LCP kernel at matmul precision highest/high/default (coarse + fine shapes)
- accuracy of the lowered precisions vs exact (top-k overlap, score error)
- ICP with nn_refresh 1/2/3
- full pipeline with the winning combination
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


def main():
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs(clutter=True)
    )
    h = tfs.shape[0]
    k = 1024
    print(f"backend {jax.default_backend()}  H={h} (clutter workload)")

    coarse_pts, coarse_nrm = model_v[::8], nrm_v[::8]
    results = {}
    for prec in ("highest", "default"):
        t, out = timeit(
            lcp.lcp_scores_pallas, tfs, coarse_pts, coarse_nrm, seg, seg_nrm,
            seg_prob, seg_mask, weighted=True, matmul_precision=prec,
        )
        results[prec] = np.asarray(out)
        print(f"coarse LCP {prec:8s}: {t*1e3:8.1f} ms  ({h/t:9.0f} hyp/s)")
    exact = results["highest"]
    top_exact = set(np.argsort(-exact)[:k].tolist())
    for prec in ("default",):
        diff = np.abs(results[prec] - exact)
        top_p = set(np.argsort(-results[prec])[:k].tolist())
        overlap = len(top_exact & top_p) / k
        # How many of the exact top-64 (the ones that matter) survive?
        top64 = set(np.argsort(-exact)[:64].tolist())
        kept64 = len(top64 & top_p) / 64
        print(f"  {prec}: max|ds|={diff.max():.5f} mean={diff.mean():.6f} "
              f"top{k} overlap={overlap:.3f} exact-top64 kept={kept64:.3f}")

    top_tfs = tfs[:k]
    for prec in ("highest", "default"):
        t, out = timeit(
            lcp.lcp_scores_pallas, top_tfs, model_v, nrm_v, seg, seg_nrm,
            seg_prob, seg_mask, weighted=True, matmul_precision=prec,
        )
        if prec == "highest":
            fine_exact = np.asarray(out)
        else:
            d = np.abs(np.asarray(out) - fine_exact)
            print(f"fine  LCP {prec:8s}: {t*1e3:8.1f} ms   max|ds|={d.max():.5f}")
            continue
        print(f"fine  LCP {prec:8s}: {t*1e3:8.1f} ms")

    for nr in (1, 2, 3):
        t, out = timeit(
            icp.refine_icp, top_tfs, model_m[::2], nrm_m[::2], seg, seg_mask,
            iters=10, point_to_plane=True, nn_refresh=nr,
        )
        print(f"ICP 10it nn_refresh={nr}: {t*1e3:8.1f} ms")

    combos = [
        dict(),  # current default
        dict(coarse_precision="default", icp_nn_refresh=2),
        dict(coarse_precision="default", fine_precision="default", icp_nn_refresh=2),
    ]
    base_top = None
    for kw in combos:
        t, out = timeit(
            scoring.score_refine_pipeline, tfs, model_m, nrm_m, model_v, nrm_v,
            seg, seg_nrm, seg_prob, seg_mask,
            top_k=k, coarse_subsample=8, icp_iters=10, icp_subsample=2,
            use_pallas=True, **kw,
        )
        best_t = np.asarray(out.top_transforms[0][:3, 3])
        s0 = float(out.top_scores[0])
        if base_top is None:
            base_top = best_t
        drift = np.linalg.norm(best_t - base_top)
        print(f"pipeline {kw or 'baseline'}: {t*1e3:8.1f} ms ({h/t:9.0f} hyp/s) "
              f"top1_score={s0:.4f} top1_drift={drift*1000:.2f} mm")


if __name__ == "__main__":
    main()
