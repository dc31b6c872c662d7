"""Measure the reference-style single-thread CPU baseline and record it.

Compiles scripts/baseline_kdtree.cc (the re-derived WeightedVerify kd-tree
loop, reference match4pcsBase.cc:1733-1766) at the bench shapes, runs it,
cross-checks with a scipy cKDTree implementation of the same loop, and writes
BASELINE_MEASURED.json at the repo root. bench.py reads that file for its
vs_baseline denominator, making the headline multiplier reproducible:

    python scripts/measure_baseline.py
"""

import json
import pathlib
import platform
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
SRC = ROOT / "scripts" / "baseline_kdtree.cc"
BIN = pathlib.Path("/tmp/baseline_kdtree")
OUT = ROOT / "BASELINE_MEASURED.json"


def measure_cpp(h=512, mode="easy"):
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", str(SRC), "-o", str(BIN)],
        check=True,
    )
    best = None
    for _ in range(3):
        r = subprocess.run(
            [str(BIN), str(h), mode], capture_output=True, text=True, check=True
        )
        d = json.loads(r.stdout)
        if best is None or d["hyps_per_sec"] > best["hyps_per_sec"]:
            best = d
    return best


def measure_scipy(h=64):
    """Same loop with scipy's C kd-tree - a sanity cross-check."""
    import numpy as np
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    nv, ns, delta = 4096, 1024, 0.005
    model = rng.uniform(-0.06, 0.06, size=(nv, 3)).astype(np.float32)
    nrm = rng.normal(size=(nv, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    seg = model[:ns] + np.array([0.05, 0.0, 0.6], np.float32)
    seg_prob = rng.uniform(0.5, 1.0, size=ns).astype(np.float32)
    trans = np.array([0.05, 0.0, 0.6]) + rng.normal(scale=0.01, size=(h, 3))
    tree = cKDTree(seg)
    cos30 = np.cos(np.radians(30.0))
    t0 = time.perf_counter()
    for t in trans:
        q = model + t
        # scipy has no radius-restricted NN; query then filter (slightly MORE
        # work than the reference's restricted query - conservative baseline).
        d, j = tree.query(q, distance_upper_bound=delta)
        hit = np.isfinite(d)
        dots = np.abs(np.sum(nrm[hit] * nrm[:ns][j[hit] % ns], axis=1))
        _ = np.sum(np.where(dots >= cos30, seg_prob[j[hit] % ns], 0.0)) / nv
    dt = time.perf_counter() - t0
    return {"hyps_per_sec": round(h / dt, 1), "H": h}


def main():
    cpp = measure_cpp(mode="easy")
    cpp_clutter = measure_cpp(mode="clutter")
    try:
        scipy_x = measure_scipy()
    except Exception as e:  # scipy optional for the record
        scipy_x = {"error": str(e)}
    record = {
        "baseline_hyps_per_sec": cpp["hyps_per_sec"],
        "baseline_hyps_per_sec_clutter": cpp_clutter["hyps_per_sec"],
        "cpp_kdtree": cpp,
        "cpp_kdtree_clutter": cpp_clutter,
        "scipy_ckdtree_crosscheck": scipy_x,
        "semantics": (
            "WeightedVerify (reference match4pcsBase.cc:1733-1766): per "
            "hypothesis, NV=4096 kd-tree NN queries (radius delta=0.005) "
            "against an NS=1024 segment cloud, normal gate 30deg, "
            "probability-weighted; single thread, -O3 -march=native"
        ),
        "host": {
            "machine": platform.machine(),
            "processor": platform.processor(),
            "python": sys.version.split()[0],
        },
        "command": "python scripts/measure_baseline.py",
        "measured_unix_time": time.time(),
    }
    OUT.write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
