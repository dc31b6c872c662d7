"""Probe: icp_seg_stride=2 at the r5 production flags.

r3 measured the knob at +4.6% for 1.33 mm top-1 drift and declined it -
ICP was then ~18% of the batch. After the r5 high3 adoption ICP is the
largest remaining device stage (~29%), so the same stride is worth ~3x
more. Re-measure: pipeline steady state + the production fidelity gates
(survival / winner score / 2 mm drift) on both workloads. Run DETACHED:
  nohup timeout --signal=TERM 3000 python scripts/r5_icp_stride_probe.py \
      > /tmp/r5_icp_probe.log 2>&1 &
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
        for stride in (1, 2):
            flags = dict(bench.prod_flags(on_tpu), icp_seg_stride=stride)

            def fn(t, flags=flags):
                return scoring.score_refine_pipeline(
                    t, model_m, nrm_m, model_v, nrm_v,
                    seg, seg_nrm, seg_prob, seg_mask, **flags).top_scores

            dt = timed(fn, tfs)
            row = {"clutter": clutter, "icp_seg_stride": stride,
                   "ms_per_batch": round(dt * 1e3, 3),
                   "hyp_per_s": round(h / dt)}
            if stride != 1:
                prod = scoring.score_refine_pipeline(
                    tfs, model_m, nrm_m, model_v, nrm_v,
                    seg, seg_nrm, seg_prob, seg_mask, **flags)
                # Exact-pipeline reference for the drift number itself.
                exact = scoring.score_refine_pipeline(
                    tfs, model_m, nrm_m, model_v, nrm_v,
                    seg, seg_nrm, seg_prob, seg_mask,
                    top_k=512, coarse_subsample=8, icp_iters=bench.ICP_ITERS,
                    icp_subsample=2, use_pallas=True, icp_precision=None,
                    icp_nn_refresh=2)
                drift = float(np.linalg.norm(
                    np.asarray(prod.top_transforms[0][:3, 3])
                    - np.asarray(exact.top_transforms[0][:3, 3])))
                row["top1_drift_mm"] = round(drift * 1e3, 3)
                try:
                    bench.fidelity_gate(inputs, prod, clutter)
                    row["fidelity_gate"] = "PASS"
                except AssertionError as e:
                    row["fidelity_gate"] = f"FAIL: {e}"
            print(json.dumps(row), flush=True)
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()
