"""HTTP service contract test (in-process server, real pipeline)."""

import json
import threading
import urllib.request

import pytest

from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.pipeline import server as server_mod
from tests.test_e2e_scene import MODELS, OBJ_CFG, SCENE, SMALL_CFG


@pytest.fixture(scope="module")
def service():
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=SMALL_CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )
    srv = server_mod.serve(db, SMALL_CFG, port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(service):
    with urllib.request.urlopen(service + "/healthz") as r:
        body = json.loads(r.read())
    assert body["ok"] and "kleenex_tissue_box" in body["objects"]


def test_pose_estimation_endpoint(service):
    req = urllib.request.Request(
        service + "/pose_estimation",
        data=json.dumps({"scene_dir": SCENE, "dataset": "APC"}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert len(body["objects"]) == 3
    for obj in body["objects"]:
        assert len(obj["pose_world"]) == 4
        assert obj["score"] > 0.05


def test_bad_request(service):
    req = urllib.request.Request(
        service + "/pose_estimation", data=b"{}", method="POST"
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "scene_dir" in json.loads(e.read())["error"]


def test_unknown_path(service):
    try:
        urllib.request.urlopen(service + "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_queue_depth_header(service):
    req = urllib.request.Request(
        service + "/pose_estimation",
        data=json.dumps({"scene_dir": SCENE, "dataset": "APC"}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        assert int(r.headers["X-Queue-Depth"]) >= 0
    # pending is decremented after the response is written - poll briefly.
    import time as time_mod

    for _ in range(100):
        with urllib.request.urlopen(service + "/healthz") as r:
            body = json.loads(r.read())
        if body["queue_depth"] == 0:
            break
        time_mod.sleep(0.02)
    assert body["queue_depth"] == 0 and body["ema_latency_s"] > 0


def test_load_shedding_503(monkeypatch):
    """Beyond max_queue waiters the server sheds with 503 + Retry-After
    instead of queueing silently (single-flight device policy). Stubbed
    pipeline: the contract under test is admission control, not pose math."""
    import time as time_mod

    from physimglobalpose_tpu.pipeline import api as api_mod

    release = threading.Event()

    def slow_estimate(*a, **k):
        release.wait(timeout=30)
        from physimglobalpose_tpu.pipeline.api import PoseEstimationResult
        return PoseEstimationResult(objects=[], timings={})

    monkeypatch.setattr(api_mod, "estimate_pose", slow_estimate)

    class FakeDB:
        names = ["stub"]

    srv = server_mod.serve(FakeDB(), None, port=0, max_queue=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/pose_estimation"
    payload = json.dumps({"scene_dir": "/nonexistent"}).encode()

    results = {}

    def first():
        req = urllib.request.Request(url, data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            results["first"] = r.status

    t = threading.Thread(target=first)
    t.start()
    # Wait until the first request holds the device (pending == 1).
    for _ in range(200):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.server_address[1]}/healthz"
        ) as r:
            if json.loads(r.read())["queue_depth"] == 1:
                break
        time_mod.sleep(0.02)
    else:
        release.set()
        raise AssertionError("first request never became in-flight")

    req = urllib.request.Request(url, data=payload, method="POST")
    try:
        urllib.request.urlopen(req, timeout=60)
        release.set()
        raise AssertionError("expected 503 while the device is busy")
    except urllib.error.HTTPError as e:
        assert e.code == 503
        assert int(e.headers["Retry-After"]) >= 1
        body = json.loads(e.read())
        assert body["error"] == "busy" and body["queue_depth"] == 1
    finally:
        release.set()
        t.join(timeout=60)
        srv.shutdown()
    assert results.get("first") == 200
