"""Server throughput under concurrent clients (VERDICT r3 #8).

Starts the HTTP service in-process (models loaded once, jits warm - the
serving deployment mode), fires N concurrent clients at /pose_estimation on
the bundled scene, and records requests/s, latency percentiles, and the load
-shedding behavior (503 + Retry-After once the line exceeds max_queue).
Client threads never touch jax (urllib only); the device stays single-flight
behind the server's lock, so this is safe on the one-jax-process rule.

Usage:
  python scripts/server_loadtest.py [--clients 4] [--requests 12]
      [--max-queue 1] [--platform cpu] [--out SERVER_LOADTEST.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = (
    "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"
)


def _warm_boot(args) -> int:
    """One fresh-process server boot with warmup: prints {"warmup_s": X}.

    Launched as a subprocess by --measure-boots (each boot must be a fresh
    process - the in-memory jit cache would make a same-process second boot
    trivially warm and prove nothing about the persistent compile cache)."""
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from physimglobalpose_tpu.models import objectdb
    from physimglobalpose_tpu.pipeline import server as server_mod
    from tests.test_e2e_scene import SMALL_CFG

    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=SMALL_CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    srv = server_mod.serve(db, SMALL_CFG, port=0, warm=True,
                           compile_cache_dir=args.compile_cache_dir)
    print(json.dumps({
        "warmup_s": round(srv.warmup_s, 2),
        "warmup_compile_s": round(srv.warmup_compile_s, 2),
        "warmup_run_s": round(srv.warmup_run_s, 2),
    }))
    return 0


def _measure_boots(args) -> dict:
    """Two sequential fresh-process warm boots against the same persistent
    compile cache (VERDICT r4 Weak #7): boot 1 compiles (and populates the
    cache), boot 2 must warm from disk - the server cold-start mitigation.
    Sequential subprocesses: one jax process at a time."""
    import subprocess

    out = {}
    for i in (1, 2):
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", "warm-boot",
             "--platform", args.platform,
             "--compile-cache-dir", args.compile_cache_dir],
            capture_output=True, text=True, timeout=3600,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"warm boot {i} failed: {proc.stdout[-500:]} {proc.stderr[-500:]}"
            )
        warm = json.loads(proc.stdout.strip().splitlines()[-1])
        out[f"boot{i}"] = dict(
            warm, process_wall_s=round(time.monotonic() - t0, 2),
        )
        print(f"boot {i}: warmup {warm['warmup_s']:.1f} s "
              f"(compile {warm.get('warmup_compile_s', 0.0):.1f} s)",
              flush=True)
    out["speedup"] = round(
        out["boot1"]["warmup_s"] / max(out["boot2"]["warmup_s"], 1e-6), 1
    )
    # The number the persistent cache can actually cut: the compile/cache-
    # load share of the warmup (warmup() isolates it by timing a second,
    # jit-cache-hot pass). End-to-end warmup_s also carries steady-state
    # execution (and, on the axon tunnel backend, remote-side variance that
    # dwarfs everything - see the artifact note).
    c1 = out["boot1"].get("warmup_compile_s", 0.0)
    c2 = out["boot2"].get("warmup_compile_s", 0.0)
    out["compile_speedup"] = round(c1 / max(c2, 1e-6), 1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=12,
                    help="total successful requests to collect")
    ap.add_argument("--max-queue", type=int, default=1)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--phase", default="loadtest",
                    choices=["loadtest", "warm-boot", "measure-boots"],
                    help="warm-boot: one fresh-process boot+warmup (internal);"
                         " measure-boots: two sequential fresh boots against "
                         "the persistent compile cache, merged into the "
                         "artifact as warm_boot_1/2")
    ap.add_argument("--compile-cache-dir", default="/tmp/jax_cache")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SERVER_LOADTEST.json"))
    args = ap.parse_args(argv)

    if args.phase == "warm-boot":
        return _warm_boot(args)
    if args.phase == "measure-boots":
        boots = _measure_boots(args)
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as fh:
                merged = json.load(fh)
        sect = merged.setdefault(args.platform, {})
        sect["warm_boots"] = dict(
            boots,
            note="two fresh-process server boots, same persistent compile "
                 "cache (pipeline/server.serve compile_cache_dir + boot "
                 "warmup pass); boot 2 warms from disk",
        )
        with open(args.out, "w") as fh:
            json.dump(merged, fh, indent=1)
        print(json.dumps(sect["warm_boots"], indent=1))
        return 0

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from physimglobalpose_tpu.models import objectdb
    from physimglobalpose_tpu.pipeline import server as server_mod
    from tests.test_e2e_scene import SMALL_CFG

    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=SMALL_CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    srv = server_mod.serve(db, SMALL_CFG, port=0, max_queue=args.max_queue)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/pose_estimation"
    payload = json.dumps({"scene_dir": SCENE, "dataset": "APC"}).encode()

    # Warm the jits (the first request compiles; not part of the measurement).
    t0 = time.monotonic()
    with urllib.request.urlopen(
        urllib.request.Request(url, data=payload, method="POST"), timeout=1800
    ) as r:
        assert len(json.loads(r.read())["objects"]) == 3
    warm_s = time.monotonic() - t0

    ok_lat: list = []
    shed: list = []  # (queue_depth, retry_after_s)
    errors: list = []
    lock = threading.Lock()
    t_start = time.monotonic()

    def client(i: int):
        while True:
            with lock:
                if len(ok_lat) >= args.requests:
                    return
            t = time.monotonic()
            try:
                req = urllib.request.Request(url, data=payload, method="POST")
                with urllib.request.urlopen(req, timeout=1800) as r:
                    body = json.loads(r.read())
                    depth = int(r.headers.get("X-Queue-Depth", -1))
                with lock:
                    ok_lat.append((time.monotonic() - t, depth))
            except urllib.error.HTTPError as e:
                if e.code == 503:
                    body = json.loads(e.read())
                    with lock:
                        shed.append((body["queue_depth"],
                                     int(e.headers["Retry-After"])))
                    # Honor the backoff signal (scaled down: the EMA is
                    # seconds-long and the test would crawl).
                    time.sleep(min(2.0, body["retry_after_s"] * 0.05))
                else:
                    with lock:
                        errors.append(f"{e.code}: {e.read()[:200]}")
                    return

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total_s = time.monotonic() - t_start

    lats = sorted(l for l, _ in ok_lat)
    depths = [d for _, d in ok_lat]
    n = len(lats)
    report = {
        "config": {
            "clients": args.clients, "target_requests": args.requests,
            "max_queue": args.max_queue, "platform": args.platform,
            "preset": "small", "scene": SCENE,
        },
        "warm_compile_s": round(warm_s, 2),
        "completed": n,
        "requests_per_sec": round(n / total_s, 4),
        "latency_s": {
            "p50": round(lats[n // 2], 3),
            "p95": round(lats[min(n - 1, int(n * 0.95))], 3),
            "max": round(lats[-1], 3),
        },
        "queue_depth_on_arrival": {
            "max": max(depths), "mean": round(sum(depths) / n, 2),
        },
        "shed_503": {
            "count": len(shed),
            "retry_after_s": sorted(set(r for _, r in shed)),
        },
        "errors": errors,
        "policy": "single-flight device; <= max_queue waiters; beyond that "
                  "503 + Retry-After = (depth+1) x EMA latency",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    # Merge per-platform: the artifact keeps one section per backend so a
    # TPU capture does not erase the CPU one (and vice versa). A legacy
    # flat-format file is adopted as its own platform's section.
    merged = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            prev = json.load(fh)
        if "config" in prev:  # legacy flat format
            merged[prev["config"]["platform"]] = prev
        else:
            merged = prev
    merged[args.platform] = report
    with open(args.out, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps(report, indent=1))
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
