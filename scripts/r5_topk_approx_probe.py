"""Probe: coarse_topk_approx (jax.lax.approx_max_k) at production flags.

The coarse top-256 selection runs an exact lax.top_k over H=16384. The TPU
PartialReduce-based approx_max_k is cheaper; the coarse gate is already
approximate by design (bf16, strided, unweighted), so the question is only
whether the production fidelity gates still hold:
 - clutter: exact weighted coarse top-64 survival into prod top-256 >= 63/64
 - easy: winner exact-score gap < 0.002 vs the exact pipeline
 - both: top-1 drift < 2 mm
plus the measured speedup. Run DETACHED on the chip:
  nohup timeout --signal=TERM 3000 python scripts/r5_topk_approx_probe.py \
      > /tmp/r5_topk_probe.log 2>&1 &
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import jax
import numpy as np

import bench
from physimglobalpose_tpu.ops import scoring

PIPE = 16
REPS = 3


def timed(fn, tfs, pipe=PIPE, reps=REPS):
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
            acc = acc + jax.tree.leaves(fn(b))[0].ravel()[0]
        float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / pipe


def main():
    on_tpu = jax.default_backend() == "tpu"
    h = bench.H
    for clutter in (False, True):
        inputs = bench.make_inputs(clutter=clutter)
        (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob,
         seg_mask) = inputs
        for approx in (False, True):
            flags = dict(bench.prod_flags(on_tpu), coarse_topk_approx=approx)

            def fn(t, flags=flags):
                return scoring.score_refine_pipeline(
                    t, model_m, nrm_m, model_v, nrm_v,
                    seg, seg_nrm, seg_prob, seg_mask, **flags).top_scores

            dt = timed(fn, tfs)
            row = {"clutter": clutter, "approx": approx,
                   "ms_per_batch": round(dt * 1e3, 3),
                   "hyp_per_s": round(h / dt)}
            if approx:
                prod = scoring.score_refine_pipeline(
                    tfs, model_m, nrm_m, model_v, nrm_v,
                    seg, seg_nrm, seg_prob, seg_mask, **flags)
                try:
                    bench.fidelity_gate(inputs, prod, clutter)
                    row["fidelity_gate"] = "PASS"
                except AssertionError as e:
                    row["fidelity_gate"] = f"FAIL: {e}"
            print(json.dumps(row), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
