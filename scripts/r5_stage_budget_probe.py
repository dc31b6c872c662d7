"""Round-5 on-chip probe: shrink the two largest remaining stage budgets.

After high3 + icp_seg_stride=2 (ROUND5_NOTES items 11-12) the pipeline sits
at ~11.8 ms/batch; the exact rescore tier (fine_exact_k=64 hypotheses at
full nv=4096/ns=1024) and the 6-iteration ICP are the largest remaining
device stages. Both budgets have margin vs their fidelity gates (top-25
exact-score diff measured 7e-5 against a 0.002 gate; top-1 drift 0.32 mm
against 2 mm), so probe tighter budgets as WHOLE-PIPELINE pipelined
timings (per the CLAUDE.md dispatch-amortization rule):

  xk32 / xk16   - exact tier rescores top-32 / top-16 only (the product
                  consumes the top-25 poses, matching the reference's
                  ~100-verified/25-consumed budget, main.cpp semantics);
                  xk16 would truncate the consumed set - included only to
                  map the curve, not adoptable.
  icp4          - 4 ICP iterations instead of 6.
  icpseg4       - ICP correspondences from every 4th segment point.
  combos        - the adoptable intersections.

Each candidate is then pushed through the bench fidelity gates (easy winner
gap + clutter survival + 2 mm drift, bench.fidelity_gate) on BOTH
workloads. Run DETACHED on the chip:
  nohup timeout --signal=TERM 3600 python scripts/r5_stage_budget_probe.py \
      > /tmp/r5_stage_budget.log 2>&1 &
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import jax
import numpy as np

import bench
from physimglobalpose_tpu.ops import scoring

PIPE = 8
REPS = 3


def timed_pipeline(fn, tfs, pipe=PIPE, reps=REPS):
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
            out = fn(b)
            acc = acc + jax.tree.leaves(out)[0].ravel()[0]
        float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / pipe


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(json.dumps({"backend": jax.default_backend(), "pipe": PIPE}),
          flush=True)
    easy = bench.make_inputs()
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob,
     seg_mask) = easy
    h = tfs.shape[0]
    base = bench.prod_flags(on_tpu)

    variants = {
        "prod": {},
        "xk32": {"fine_exact_k": 32},
        "xk16": {"fine_exact_k": 16},
        "icp4": {"icp_iters": 4},
        "icpseg4": {"icp_seg_stride": 4},
        "xk32+icp4": {"fine_exact_k": 32, "icp_iters": 4},
        "xk32+icpseg4": {"fine_exact_k": 32, "icp_seg_stride": 4},
    }
    results = {}
    for name, extra in variants.items():
        flags = dict(base, **extra)

        def fn(t, flags=flags):
            out = scoring.score_refine_pipeline(
                t, model_m, nrm_m, model_v, nrm_v,
                seg, seg_nrm, seg_prob, seg_mask, **flags,
            )
            return out.top_scores
        dt = timed_pipeline(fn, tfs)
        results[name] = dt
        print(json.dumps({"variant": name, "ms_per_batch": round(dt * 1e3, 3),
                          "hyp_per_s": round(h / dt)}), flush=True)

    # Fidelity: (a) top-25 agreement vs prod on easy, (b) the full bench
    # gates (vs the exact pipeline) on easy AND clutter per candidate.
    prod_out = scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask, **base)
    s_prod = np.asarray(prod_out.top_scores[:25])
    clutter = bench.make_inputs(clutter=True)

    for name, extra in variants.items():
        if name == "prod":
            continue
        flags = dict(base, **extra)
        var_out = scoring.score_refine_pipeline(
            tfs, model_m, nrm_m, model_v, nrm_v,
            seg, seg_nrm, seg_prob, seg_mask, **flags)
        n25 = min(25, int(flags["fine_exact_k"]))
        sdiff = float(np.max(np.abs(
            s_prod[:n25] - np.asarray(var_out.top_scores[:n25]))))
        drift = float(np.linalg.norm(
            np.asarray(prod_out.top_transforms[0][:3, 3])
            - np.asarray(var_out.top_transforms[0][:3, 3])))
        gates = {}
        for tag, inp in (("easy", easy), ("clutter", clutter)):
            (ctfs, cmm, cnm, cmv, cnv, cs, csn, csp, csm) = inp
            cand = scoring.score_refine_pipeline(
                ctfs, cmm, cnm, cmv, cnv, cs, csn, csp, csm, **flags)
            try:
                bench.fidelity_gate(inp, cand, tag == "clutter")
                gates[tag] = "PASS"
            except AssertionError as e:
                gates[tag] = f"FAIL: {e}"
        print(json.dumps({
            "fidelity": name,
            "top25_score_diff_vs_prod": sdiff,
            "top1_drift_vs_prod_mm": round(drift * 1e3, 4),
            "gates": gates,
        }), flush=True)

    print(json.dumps({"done": True, "results_ms": {
        k: round(v * 1e3, 3) for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
