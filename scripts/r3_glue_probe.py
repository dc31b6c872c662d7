"""Where does the non-kernel 'glue' time in the bench pipeline go?

Stage kernels sum to ~10 ms/batch but the pipe=8 pipeline runs ~20 ms with
~4 ms dispatch - this times cumulative prefixes of the production pipeline
to locate the rest (top_k over 16384, gathers, the ICP scan's 6x6 solves,
final argsort).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp

import bench
from physimglobalpose_tpu.ops import icp as icp_mod
from physimglobalpose_tpu.ops import lcp as lcp_mod

PIPE = 8


def timed(fn, tfs, reps=4):
    out = fn(tfs)
    float(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for i in range(reps):
        batches = [tfs.at[:, 0, 3].add(1e-6 * (i * PIPE + p + 1)) for p in range(PIPE)]
        float(batches[-1][0, 0, 0])
        t0 = time.perf_counter()
        acc = 0.0
        for b in batches:
            out = fn(b)
            acc = acc + jax.tree.leaves(out)[0].ravel()[0]
        float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / PIPE


def main():
    on_tpu = jax.default_backend() == "tpu"
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = (
        bench.make_inputs()
    )
    coarse_pts, coarse_nrm = model_v[::16], nrm_v[::16]
    c_seg, c_nrm = seg[::4], seg_nrm[::4]
    c_prob, c_mask = seg_prob[::4], seg_mask[::4]
    icp_pts, icp_nrm = model_m[::2], nrm_m[::2]
    prec = "default" if on_tpu else None

    def coarse(t):
        return lcp_mod.lcp_scores(
            t, coarse_pts, coarse_nrm, c_seg, c_nrm, c_prob, c_mask,
            weighted=False, use_pallas=on_tpu, matmul_precision=prec)

    @jax.jit
    def p1(t):
        return coarse(t)

    @jax.jit
    def p2(t):
        s = coarse(t)
        _, idx = jax.lax.top_k(s, 256)
        return t[idx]

    @jax.jit
    def p3(t):
        top = p2.__wrapped__(t)
        return icp_mod.refine_icp_pallas_segside(
            top, icp_pts, icp_nrm, seg, seg_mask, iters=6,
            matmul_precision=prec)

    @jax.jit
    def p4(t):
        refined = p3.__wrapped__(t)
        return lcp_mod.lcp_scores(
            refined, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask,
            weighted=True, use_pallas=on_tpu, matmul_precision=prec)

    @jax.jit
    def p5(t):
        refined = p3.__wrapped__(t)
        fine = lcp_mod.lcp_scores(
            refined, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask,
            weighted=True, use_pallas=on_tpu, matmul_precision=prec)
        _, idx_e = jax.lax.top_k(fine, 64)
        exact = lcp_mod.lcp_scores(
            refined[idx_e], model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask,
            weighted=True, use_pallas=on_tpu)
        fine = fine.at[idx_e].set(exact)
        order = jnp.argsort(-fine)
        return refined[order], fine[order]

    names = ["coarse", "+topk256+gather", "+icp6", "+finebulk", "+exact+sort"]
    prev = 0.0
    for name, fn in zip(names, [p1, p2, p3, p4, p5]):
        t = timed(fn, tfs)
        print(f"{name:18s}: {t*1e3:7.2f} ms/batch (+{(t-prev)*1e3:6.2f})")
        prev = t


if __name__ == "__main__":
    main()
