"""Round-5 on-chip probe: exact-tier high3 + fine-tier HB lane packing.

VERDICT r4 Next #5 asks for the coarse tier's hypothesis-batching trick on
the fine tier, target bench >= 1.3 M hyp/s (or the measured bound). The two
candidate levers, both inert until now:

1. exact_precision="high3" (ops/lcp._dot_high3): the exact rescore tier
   currently runs f32 HIGHEST = 6 bf16 MXU passes; high3 is the manual
   3-pass hi/lo split (~2x the MXU rate, ~1e-7 d^2 error vs the 2.5e-5
   match threshold).
2. fine_hb_lane_pack=True: the generalized model-tiled HB kernel layout for
   the bulk fine tier (one wide matmul per grid program instead of 8
   per-hypothesis matmuls; same matmul count at fine shapes - see the
   analysis in ROUND5_NOTES - so this measures whether the b-build /
   bookkeeping shuffle matters).

Measures per-batch steady state (pipelined like bench.py) for each variant
plus stage micro-timings, and the high3 exact-tier score agreement against
f32. Prints JSON lines. Run DETACHED on the chip:
  nohup timeout --signal=TERM 3000 python scripts/r5_perf_probe.py \
      > /tmp/r5_perf_probe.log 2>&1 &
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import jax
import numpy as np

import bench
from physimglobalpose_tpu.ops import lcp as lcp_mod
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
    print(json.dumps({"backend": jax.default_backend(), "pipe": PIPE}))
    inputs = bench.make_inputs()
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = inputs
    h = tfs.shape[0]
    base = bench.prod_flags(on_tpu)

    variants = {
        "prod": {},
        "high3": {"exact_precision": "high3"},
        "fine_hb": {"fine_hb_lane_pack": True},
        "high3+fine_hb": {"exact_precision": "high3",
                          "fine_hb_lane_pack": True},
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

    # Correctness: high3 exact tier vs f32 on the same survivors.
    prod = scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask, **base)
    hi3 = scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask,
        **dict(base, exact_precision="high3"))
    s0 = np.asarray(prod.top_scores[:25])
    s1 = np.asarray(hi3.top_scores[:25])
    drift = float(np.linalg.norm(
        np.asarray(prod.top_transforms[0][:3, 3])
        - np.asarray(hi3.top_transforms[0][:3, 3])))
    print(json.dumps({
        "check": "high3_vs_f32_exact_tier",
        "max_abs_score_diff_top25": float(np.max(np.abs(s0 - s1))),
        "top1_drift_mm": round(drift * 1e3, 4),
    }), flush=True)

    # Stage micro: exact tier alone (64 hyps, full seg, nv=4096).
    top64 = tfs[:64]
    for prec, tag in ((None, "exact_f32_highest"), ("high3", "exact_high3")):
        def efn(t, prec=prec):
            return lcp_mod.lcp_scores(
                t, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask,
                weighted=True, use_pallas=on_tpu, matmul_precision=prec)
        dt = timed_pipeline(efn, top64)
        print(json.dumps({"stage": tag, "ms": round(dt * 1e3, 3)}), flush=True)

    # Stage micro: fine bulk (256 hyps, seg/4) per-hyp vs HB-tiled.
    top256 = tfs[:256]
    for hb, tag in ((False, "fine_bulk_perhyp"), (True, "fine_bulk_hb")):
        def ffn(t, hb=hb):
            return lcp_mod.lcp_scores(
                t, model_v, nrm_v,
                seg[::4], seg_nrm[::4], seg_prob[::4], seg_mask[::4],
                weighted=True, use_pallas=on_tpu,
                matmul_precision="default" if on_tpu else None,
                hb_lane_pack=hb)
        dt = timed_pipeline(ffn, top256)
        print(json.dumps({"stage": tag, "ms": round(dt * 1e3, 3)}), flush=True)

    print(json.dumps({"done": True, "results_ms": {
        k: round(v * 1e3, 3) for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
