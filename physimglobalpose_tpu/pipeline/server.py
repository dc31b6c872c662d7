"""HTTP service honoring the /pose_estimation contract.

The reference exposes the pipeline as a ROS service (main.cpp:210-212,
EstimateObjectPose.srv); here the same request shape is a JSON POST to a
long-running process (models stay loaded, jits stay warm - the serving
deployment mode):

  POST /pose_estimation
  {"dataset": "APC", "scene_dir": "...", "segmentation_mode": "GT",
   "hypothesis_mode": "PCS", "verification_mode": "LCP", "seed": 0}
  -> {"objects": [{"name", "pose_world" (4x4), "pose_cam", "score"}, ...],
      "timings": {...}}

Queueing policy (the reference's ROS service is implicitly single-flight,
main.cpp:210-212; ours states its policy): the device is single-flight —
one scene at a time holds the device lock. Up to max_queue additional
requests WAIT in line (every response carries an X-Queue-Depth header with
the line length it saw on arrival); beyond that the server sheds load with
503 + a Retry-After estimate of (depth+1) x the EMA request latency, so
clients back off instead of piling onto an unbounded queue. /healthz reports
{queue_depth, ema_latency_s}. Measured under concurrent clients by
scripts/server_loadtest.py (SERVER_LOADTEST.json).

Run: python -m physimglobalpose_tpu.pipeline.server --port 8080 \
       --obj-config ... --model-dir ...
"""

from __future__ import annotations

import argparse
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(db, default_cfg, max_queue: int = 4):
    import time

    from physimglobalpose_tpu.pipeline import api

    lock = threading.Lock()  # one scene at a time through the device
    state = {"pending": 0, "ema_s": 30.0}  # ema seeded at a cold-ish guess
    state_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload, headers=()):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                with state_lock:
                    depth, ema = state["pending"], state["ema_s"]
                self._reply(200, {
                    "ok": True, "objects": db.names,
                    "queue_depth": depth, "ema_latency_s": round(ema, 3),
                })
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/pose_estimation":
                self._reply(404, {"error": "unknown path"})
                return
            # Admission control BEFORE joining the device line: the device
            # is single-flight; max_queue callers may wait, the rest get an
            # explicit backoff signal instead of an unbounded silent queue.
            with state_lock:
                depth = state["pending"]
                if depth > max_queue:
                    retry = math.ceil((depth + 1) * state["ema_s"])
                    self._reply(
                        503,
                        {"error": "busy", "queue_depth": depth,
                         "retry_after_s": retry},
                        headers=[("Retry-After", str(retry)),
                                 ("X-Queue-Depth", str(depth))],
                    )
                    return
                state["pending"] += 1
            t0 = time.monotonic()
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                with lock:
                    result = api.estimate_pose(
                        req["scene_dir"],
                        db,
                        dataset=req.get("dataset", "APC"),
                        segmentation_mode=req.get("segmentation_mode", "GT"),
                        hypothesis_mode=req.get("hypothesis_mode", "PCS"),
                        verification_mode=req.get("verification_mode", "LCP"),
                        cfg=default_cfg,
                        seed=int(req.get("seed", 0)),
                        write_result=bool(req.get("write_result", False)),
                    )
                # EMA over SUCCESSFUL requests only (errors return in
                # milliseconds and would drag the Retry-After estimate to 0).
                dt = time.monotonic() - t0
                with state_lock:
                    state["ema_s"] = 0.7 * state["ema_s"] + 0.3 * dt
                self._reply(
                    200,
                    {
                        "objects": [
                            {
                                "name": o.name,
                                "pose_world": o.pose_world.tolist(),
                                "pose_cam": o.pose_cam.tolist(),
                                "score": o.score,
                            }
                            for o in result.objects
                        ],
                        "timings": result.timings,
                    },
                    headers=[("X-Queue-Depth", str(depth))],
                )
            except (KeyError, ValueError, FileNotFoundError) as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # noqa: BLE001 - service boundary
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                with state_lock:
                    state["pending"] -= 1

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(db, cfg, port: int = 8080, host: str = "127.0.0.1",
          max_queue: int = 4):
    """Start the service (blocking). Returns the server for programmatic use.

    max_queue: waiters allowed behind the in-flight request before the
    server sheds load with 503 + Retry-After (see module docstring)."""
    server = ThreadingHTTPServer(
        (host, port), make_handler(db, cfg, max_queue=max_queue)
    )
    return server


def main(argv=None):
    p = argparse.ArgumentParser(description="pose estimation HTTP service")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--obj-config", required=True)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--cache-dir", default="/tmp/physim_tpu_cache")
    p.add_argument("--objects", nargs="*", default=None)
    p.add_argument("--max-queue", type=int, default=4,
                   help="waiters allowed behind the in-flight request before "
                        "503 + Retry-After load shedding")
    p.add_argument("--preset", default="default", choices=["default", "small"])
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from physimglobalpose_tpu.config import (
        PipelineConfig, PreprocessConfig, StoCSConfig,
    )
    from physimglobalpose_tpu.models import objectdb

    if args.preset == "small":
        cfg = PipelineConfig(
            preprocess=PreprocessConfig(max_segment_points=512),
            stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
            max_model_points=512,
            max_validation_points=1024,
        )
    else:
        cfg = PipelineConfig()
    db = objectdb.load_object_db(
        args.obj_config, args.model_dir, config=cfg,
        cache_dir=args.cache_dir, only=args.objects,
    )
    server = serve(db, cfg, port=args.port, host=args.host,
                   max_queue=args.max_queue)
    print(f"pose_estimation service on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
