"""Benchmark: pose-hypothesis scoring throughput (ICP + LCP) per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (the reference's hottest path, SURVEY.md section 3): H candidate
poses of a dense model cloud scored against an observed segment, through the
production scoring pipeline (ops/scoring.py): coarse LCP ranking over all H
(subsampled validation cloud, bf16 on TPU), batched point-to-plane ICP on
the top-256 survivors, two-tier full-resolution weighted-LCP rescoring. The reference
does the equivalent serially: per-transform kd-tree NN loops
(match4pcsBase.cc:1699-1766) inside a 2 s/object budget.

The vs_baseline denominator is MEASURED, not assumed: BASELINE_MEASURED.json
is produced by `python scripts/measure_baseline.py`, which compiles and runs
scripts/baseline_kdtree.cc - a single-thread C++ re-derivation of
WeightedVerify at these exact shapes (NV=4096 queries vs an NS=1024-point
kd-tree, delta=0.005) - and records the number with provenance.
"""

import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.ops import scoring

_FALLBACK_BASELINE = 2041.7  # scripts/measure_baseline.py on the 2026-08 host


def baseline_hyps_per_sec(clutter: bool = False) -> float:
    p = pathlib.Path(__file__).resolve().parent / "BASELINE_MEASURED.json"
    key = "baseline_hyps_per_sec_clutter" if clutter else "baseline_hyps_per_sec"
    try:
        return float(json.loads(p.read_text())[key])
    except (OSError, KeyError, ValueError):
        return _FALLBACK_BASELINE

H = 16384  # hypotheses per batch
NV = 4096  # dense validation cloud (max_validation_points)
NM = 1024  # sparse ICP model cloud (max_model_points)
NS = 1024  # segment size (max_segment_points)
ICP_ITERS = 6  # EXACT-reference pipeline iterations (the fidelity yardstick)
PROD_ICP_ITERS = 4  # production budget (r5 probe, gated vs the 6-iter exact)


def prod_flags(on_tpu: bool) -> dict:
    """The tuned production flag set (single source for the timed loop AND
    the fidelity gate - see score_step's rationale comments)."""
    return dict(
        top_k=256, coarse_subsample=16, coarse_seg_stride=4,
        # 4 ICP iterations against the exact pipeline's 6 (the gate keeps
        # comparing to the 6-iter exact reference): measured r5
        # (scripts/r5_stage_budget_probe.py) -0.74 ms/batch, top-1 drift vs
        # prod-6it 0.0025 mm, all fidelity gates PASS on both workloads.
        icp_iters=PROD_ICP_ITERS if on_tpu else ICP_ITERS, icp_subsample=2,
        use_pallas=on_tpu,
        coarse_precision="default" if on_tpu else None,
        icp_nn_refresh=2, coarse_weighted=False,
        fine_precision="default" if on_tpu else None,
        # Exact-rescore budget 32 (the product consumes the top-25 poses,
        # matching the reference's ~100-verified/25-consumed budget): r5
        # probe measured -1.2 ms/batch vs 64 with top-25 exact-score diff
        # 2.5e-4 (gate 0.002) and ZERO top-1 drift; gates PASS both
        # workloads. Combined with icp_iters=4: 13.43 -> 10.50 ms/batch at
        # pipe=8.
        fine_exact_k=32 if on_tpu else 64,
        fine_seg_stride=4 if on_tpu else 1,
        icp_precision="default" if on_tpu else None,
        # Exact rescore tier at high3 (3-pass bf16 hi/lo split) instead of
        # f32 HIGHEST (6 passes): measured r5 (scripts/r5_perf_probe.py)
        # 16.5 -> 14.2 ms/batch at pipe=8, top-25 exact-score diff <= 7e-5
        # (vs the 0.002 gate) and top-1 drift 0.10 mm (vs 2 mm).
        exact_precision="high3" if on_tpu else None,
        # ICP correspondences from every 2nd segment point: r3 measured
        # +4.6% and declined when ICP was ~18% of the batch; after high3 it
        # is the largest remaining stage (~29%), re-measured r5
        # (scripts/r5_icp_stride_probe.py) 12.85 -> 11.77 ms/batch with
        # top-1 drift 0.32 mm easy / 1.33 mm clutter (gate 2 mm) and both
        # fidelity gates green. The solve is a robust least squares over
        # ~1k points; 512 still overdetermine the 6-DoF update.
        icp_seg_stride=2 if on_tpu else 1,
    )


def make_inputs(seed=0, clutter=False, h=H, nv=NV, nm=NM, ns=NS):
    """Bench inputs. clutter=True mirrors scripts/baseline_kdtree.cc's hard
    mode: a quarter of the segment is uniform clutter and half the
    hypotheses are garbage (0.1-0.3 m off) - the ranking-fidelity workload
    (the easy mode's hypotheses are all near-correct, so mis-ranking would
    not show)."""
    rng = np.random.default_rng(seed)
    model_v = rng.uniform(-0.06, 0.06, size=(nv, 3)).astype(np.float32)
    nrm_v = rng.normal(size=(nv, 3)).astype(np.float32)
    nrm_v /= np.linalg.norm(nrm_v, axis=1, keepdims=True)
    model_m = model_v[:nm]
    nrm_m = nrm_v[:nm]
    offset = np.array([0.05, 0.0, 0.6], np.float32)
    seg = (model_v[:ns] + offset).astype(np.float32)
    seg_nrm = nrm_v[:ns].copy()
    if clutter:
        n_cl = ns // 4
        seg[ns - n_cl :] = rng.uniform(-0.2, 0.2, size=(n_cl, 3)) + offset
        cn = rng.normal(size=(n_cl, 3)).astype(np.float32)
        seg_nrm[ns - n_cl :] = cn / np.linalg.norm(cn, axis=1, keepdims=True)
    seg_prob = rng.uniform(0.5, 1.0, size=ns).astype(np.float32)
    seg_mask = np.ones(ns, bool)
    # Hypotheses: perturbations around the true offset (+ garbage half in
    # clutter mode).
    tfs = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    tfs[:, :3, 3] = offset + rng.normal(scale=0.01, size=(h, 3))
    if clutter:
        sign = np.where(np.arange(h) % 4 == 1, 1.0, -1.0)
        bad = np.arange(h) % 2 == 1
        tfs[bad, 0, 3] += (rng.uniform(0.1, 0.3, size=h) * sign)[bad]
        tfs[bad, 1, 3] += rng.uniform(0.1, 0.3, size=h)[bad]
    return (
        jnp.asarray(tfs),
        jnp.asarray(model_m), jnp.asarray(nrm_m),
        jnp.asarray(model_v), jnp.asarray(nrm_v),
        jnp.asarray(seg), jnp.asarray(seg_nrm),
        jnp.asarray(seg_prob), jnp.asarray(seg_mask),
    )


def fidelity_gate(inputs, prod, clutter: bool) -> None:
    """Assert the production path's ranking fidelity against the exact
    pipeline ON THE SAME INPUTS - the tests/test_tpu_bf16.py gates, run
    inline so a bench capture that violates them FAILS loudly instead of
    reporting a fast number (VERDICT r3 Weak #3 / Next #5). Gates:
    clutter - exact weighted coarse top-64 survival into the production
    top-256 >= 63/64; easy - winner's exact-f32 fine score gap < 0.002;
    both - top-1 translation drift < 2 mm."""
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = inputs
    exact = scoring.score_refine_pipeline(
        tfs, model_m, nrm_m, model_v, nrm_v,
        seg, seg_nrm, seg_prob, seg_mask,
        top_k=512, coarse_subsample=8, icp_iters=ICP_ITERS, icp_subsample=2,
        use_pallas=True, icp_precision=None, icp_nn_refresh=2,
    )
    if clutter:
        prod_top256 = set(np.argsort(-np.asarray(prod.coarse_scores))[:256].tolist())
        exact_top64 = set(np.argsort(-np.asarray(exact.coarse_scores))[:64].tolist())
        survival = len(exact_top64 & prod_top256)
        assert survival >= 63, (
            f"BENCH GATE FAILED: only {survival}/64 of the exact coarse "
            f"top-64 survive the production ranking (clutter)"
        )
    else:
        gap = float(exact.top_scores[0]) - float(prod.top_scores[0])
        assert gap < 0.002, (
            f"BENCH GATE FAILED: production winner trails the exact "
            f"pipeline's winner by {gap:.4f} (easy)"
        )
    drift = float(
        np.linalg.norm(
            np.asarray(prod.top_transforms[0][:3, 3])
            - np.asarray(exact.top_transforms[0][:3, 3])
        )
    )
    assert drift < 0.002, (
        f"BENCH GATE FAILED: top-1 drifts {drift * 1000:.2f} mm from the "
        f"exact pipeline winner (clutter={clutter})"
    )


def main():
    import os

    on_tpu = jax.default_backend() == "tpu"
    # BENCH_VARIANT=clutter measures the hard ranking workload (the driver's
    # default run stays the easy config for cross-round comparability); the
    # baseline denominator switches to the matching measured mode.
    clutter = os.environ.get("BENCH_VARIANT", "easy") == "clutter"
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = make_inputs(
        clutter=clutter
    )

    def score_step(tfs):
        # Tuned r3 on v5e (scripts/r3_perf_experiments.py + r3_lcp_micro.py
        # + r3_coarse_experiments.py): bf16 UNWEIGHTED coarse ranking on a
        # 4x-strided segment and NV=256 validation subsample (exact-top-64
        # survival 64/64 on the clutter workload at seg stride 4; NV=128
        # drops to 63/64 and NV=64 fails 58/64 - NV=256 is the margin),
        # segment-stationary Pallas ICP (ops/icp.py
        # _icp_corr_kernel_segside) at bf16 with per-iteration
        # correspondences, two-tier fine rescoring (bf16
        # bulk + exact fp32 top-64). top_k=256 refine budget: the reference
        # verifies ~100 hypotheses per object total and the product consumes
        # the top-25; measured on the clutter workload the exact top-64
        # survive 64/64 into the coarse top-256 and the top-1 lands within
        # 0.8 mm of the exact pipeline winner (scripts/r3_topk_experiments.py;
        # top_k=128 fails survival 46/64 - that is the floor).
        # (fine_seg_stride=4: the bulk fine tier only ranks the 256 ICP
        # survivors down to the exact fp32 top-64, and the exact tier
        # rescores winners at full resolution. Measured on-chip
        # (scripts/r3_fine_stride_probe.py): top-1 drift and winner score
        # gap IDENTICAL to stride 1 on both workloads, top-25 exact
        # scores within 2e-4; throughput 870k -> 1.08M hyp/s.)
        out = scoring.score_refine_pipeline(
            tfs, model_m, nrm_m, model_v, nrm_v,
            seg, seg_nrm, seg_prob, seg_mask, **prod_flags(on_tpu),
        )
        return out.top_transforms, out.top_scores

    # Warm-up / compile. NOTE: on the axon TPU backend block_until_ready is
    # effectively a no-op; fetching a value is the only reliable barrier.
    refined, scores = score_step(tfs)
    float(scores[0])

    # Fidelity gate BEFORE timing: the number is only reported if the
    # production path still matches the exact pipeline (survival/drift/score
    # gates). On CPU the production flags are already exact, so the gate is
    # TPU-only (and the exact pipeline's CPU compile is minutes-slow).
    if on_tpu:
        prod_full = scoring.score_refine_pipeline(
            tfs, model_m, nrm_m, model_v, nrm_v,
            seg, seg_nrm, seg_prob, seg_mask, **prod_flags(True),
        )
        fidelity_gate(
            (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob,
             seg_mask),
            prod_full, clutter,
        )

    # Steady-state throughput: each timed repetition enqueues PIPE batches
    # back-to-back (distinct on-device inputs) and fetches ONE scalar that
    # depends on all of them. The per-dispatch tunnel round trip (~31 ms
    # measured on the axon backend, scripts/r3_lcp_micro.py overhead_probe)
    # then amortizes across the batches exactly as it does in production
    # streaming, instead of being paid per batch as a serial
    # dispatch-fetch-dispatch loop would.
    # pipe=16 measured (scripts/r3_stage_profile.py): the fixed ~31 ms round
    # trip amortizes to ~1.9 ms/batch (pipe=8: ~3.9, ~6% slower; deeper than
    # 16 is inside run-to-run noise). Production streaming (the scene sweep's
    # pipelined dispatch) consumes the pipeline the same way.
    # BENCH_PIPE overrides the dispatch-pipeline depth for tuning probes
    # (default 16: measured optimum band - r3 notes; 32 re-measured r4:
    # inside noise of 16, so 16 stays).
    pipe = int(os.environ.get("BENCH_PIPE", "16")) if on_tpu else 1
    iters = 5 if on_tpu else 1
    times = []
    for i in range(iters):
        batches = [
            tfs.at[:, 0, 3].add(1e-6 * (i * pipe + p + 1)) for p in range(pipe)
        ]
        float(batches[-1][0, 0, 0])  # settle inputs before timing
        t0 = time.perf_counter()
        acc = 0.0
        for b in batches:
            refined, scores = score_step(b)
            acc = acc + scores[0]
        float(acc)  # one fetch forcing every batch to materialize
        times.append(time.perf_counter() - t0)
    dt = min(times) / pipe  # best steady-state per-batch time

    hyps_per_sec = H / dt
    variant = "clutter" if clutter else "easy"
    print(
        json.dumps(
            {
                "metric": "hypotheses_scored_per_sec_per_chip",
                "value": round(hyps_per_sec, 1),
                "unit": f"hyp/s (coarse-LCP@256/seg4 -> ICP-{PROD_ICP_ITERS}it@512/seg2 top-256 -> fine-LCP@4k/seg4+exact32@high3, H=16384 x{pipe} pipelined, {variant})",
                "vs_baseline": round(hyps_per_sec / baseline_hyps_per_sec(clutter), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
