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
