"""Micro-bench of the LCP segside kernel after the SMEM/bf16 overhead fixes.

Coarse (unweighted, bf16, NV=512 x H=16384) and fine (weighted, bf16 and
exact, NV=4096 x 512/64) shapes, plus correctness vs the XLA path at a small
shape on this backend.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from physimglobalpose_tpu.ops import lcp


def _sync(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]


def timeit(fn, *args, n=5, **kw):
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
    print(f"backend {jax.default_backend()}")
    overhead_probe()

    # correctness spot-check vs XLA on 64 hypotheses (exact + bf16).
    args64 = (tfs[:64], model_v[::8], nrm_v[::8], seg, seg_nrm, seg_prob, seg_mask)
    want = np.asarray(lcp.lcp_scores_xla(*args64, weighted=False))
    got = np.asarray(lcp.lcp_scores_pallas_segside(*args64, weighted=False))
    got_bf = np.asarray(
        lcp.lcp_scores_pallas_segside(*args64, weighted=False,
                                      matmul_precision="default")
    )
    print(f"exact |ds| max {np.abs(got - want).max():.6f}  "
          f"bf16 |ds| max {np.abs(got_bf - want).max():.6f}")

    t, _ = timeit(
        lcp.lcp_scores_pallas_segside, tfs, model_v[::8], nrm_v[::8],
        seg, seg_nrm, seg_prob, seg_mask, weighted=False,
        matmul_precision="default",
    )
    print(f"coarse bf16 unweighted @512 xH : {t*1e3:8.1f} ms ({h/t:9.0f} hyp/s)")

    t, _ = timeit(
        lcp.lcp_scores_pallas_segside, tfs[:512], model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask, weighted=True,
        matmul_precision="default",
    )
    print(f"fine bf16 weighted @4k x512    : {t*1e3:8.1f} ms")
    t, _ = timeit(
        lcp.lcp_scores_pallas_segside, tfs[:64], model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask, weighted=True,
    )
    print(f"fine exact weighted @4k x64    : {t*1e3:8.1f} ms")

    # coarse data-reduction variants (ranking-proxy candidates; quality gated
    # by the exact-top-64 survival test on this workload).
    exact_c = np.asarray(lcp.lcp_scores_xla(
        tfs, model_v[::8], nrm_v[::8], seg, seg_nrm, seg_prob, seg_mask,
        weighted=True, h_chunk=64))
    top64 = set(np.argsort(-exact_c)[:64].tolist())
    for label, mv, sstride in (
        ("nv256 seg1", model_v[::16], 1),
        ("nv512 seg2", model_v[::8], 2),
        ("nv256 seg2", model_v[::16], 2),
    ):
        nv_c = mv
        nn_c = nrm_v[:: (4096 // len(mv))]
        t, out = timeit(
            lcp.lcp_scores_pallas_segside, tfs, nv_c, nn_c,
            seg[::sstride], seg_nrm[::sstride], seg_prob[::sstride],
            seg_mask[::sstride], weighted=False, matmul_precision="default",
        )
        sc = np.asarray(out)
        top512 = set(np.argsort(-sc)[:512].tolist())
        surv = len(top64 & top512)
        print(f"coarse {label:12s}: {t*1e3:8.1f} ms ({h/t:9.0f} hyp/s) "
              f"exact-top64 survival {surv}/64")



def overhead_probe():
    """Fixed per-dispatch cost through the tunnel: trivial jitted op + fetch."""
    import functools

    @jax.jit
    def noop(x):
        return jnp.sum(x) * 0.0 + 1.0

    x = jnp.ones((16384, 4, 4), jnp.float32)
    _sync(noop(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(noop(x))
        best = min(best, time.perf_counter() - t0)
    print(f"dispatch+fetch overhead        : {best*1e3:8.1f} ms")

if __name__ == "__main__":
    main()
