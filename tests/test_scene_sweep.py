"""Scene-sweep data parallelism: sharded sweep == serial pipeline.

BASELINE config 5 (scenes/sec across a multi-chip slice): a batch of scenes'
(scene, object) jobs run as one device program with the job axis sharded
over the virtual 8-device mesh. Per-scene results must match the serial
api.estimate_pose path (same seed -> same keys -> same poses).
"""

import shutil

import jax
import numpy as np
import pytest

from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.parallel import mesh as mesh_mod
from physimglobalpose_tpu.parallel import scene_sweep
from physimglobalpose_tpu.pipeline import api

from tests.test_e2e_scene import MODELS, OBJ_CFG, SCENE, SMALL_CFG


@pytest.fixture(scope="module")
def db():
    return objectdb.load_object_db(
        OBJ_CFG, MODELS, config=SMALL_CFG, cache_dir="/tmp/ppf_cache",
        only=["kleenex_tissue_box", "expo_dry_erase_board_eraser",
              "folgers_classic_roast_coffee"],
    )


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


def test_sharded_sweep_matches_serial(db, mesh8, tmp_path):
    scene_b = str(tmp_path / "scene_b")
    shutil.copytree(SCENE, scene_b)

    serial = api.estimate_pose(
        SCENE, db, dataset="APC", segmentation_mode="GT",
        hypothesis_mode="PCS", verification_mode="LCP",
        cfg=SMALL_CFG, seed=0, write_result=False,
    )
    swept = scene_sweep.sweep_scenes(
        mesh8, [SCENE, scene_b], db, dataset="APC",
        segmentation_mode="GT", cfg=SMALL_CFG, seed=0,
    )
    assert set(swept) == {SCENE, scene_b}
    for sd in (SCENE, scene_b):  # identical scene content -> identical result
        got = swept[sd]
        assert [o.name for o in got.objects] == [o.name for o in serial.objects]
        for o_got, o_want in zip(got.objects, serial.objects):
            # LCP scores quantize to 1/1024 (one validation point); float
            # reassociation across batch sizes can flip a borderline inlier,
            # so allow a couple of points' worth of slack.
            np.testing.assert_allclose(o_got.score, o_want.score, atol=3e-3)
            np.testing.assert_allclose(
                o_got.pose_cam, o_want.pose_cam, atol=5e-4,
                err_msg=f"{sd}:{o_got.name}",
            )
            np.testing.assert_allclose(
                o_got.hypothesis_scores, o_want.hypothesis_scores, atol=3e-3
            )
    assert got.timings["scenes_per_sec"] > 0


def test_evaluate_scenes_sharded_logs(db, mesh8, tmp_path):
    from physimglobalpose_tpu.pipeline import evaluate

    log = str(tmp_path / "sweep.jsonl")
    agg = evaluate.evaluate_scenes(
        [SCENE], db, log, dataset="APC", segmentation_mode="GT",
        verification_mode="LCP", cfg=SMALL_CFG, seed=0, mesh=mesh8,
    )
    assert agg["scenes"] == 1.0
    # Resume: a second call skips the already-logged scene.
    agg2 = evaluate.evaluate_scenes(
        [SCENE], db, log, dataset="APC", segmentation_mode="GT",
        verification_mode="LCP", cfg=SMALL_CFG, seed=0, mesh=mesh8,
    )
    assert agg2["scenes"] == 1.0


def test_pipelined_sweep_matches_unchunked(db, tmp_path):
    # pipeline_chunks=2 overlaps chunk i+1's preprocessing/uploads with
    # chunk i's device program; per-scene results must match the unchunked
    # sweep (jobs are independent, per-scene PRNG flow is fixed).
    scene_b = str(tmp_path / "scene_b")
    shutil.copytree(SCENE, scene_b)
    plain = scene_sweep.sweep_scenes(
        None, [SCENE, scene_b], db, dataset="APC",
        segmentation_mode="GT", cfg=SMALL_CFG, seed=0,
    )
    piped = scene_sweep.sweep_scenes(
        None, [SCENE, scene_b], db, dataset="APC",
        segmentation_mode="GT", cfg=SMALL_CFG, seed=0, pipeline_chunks=2,
    )
    assert set(piped) == set(plain) == {SCENE, scene_b}
    for sd in plain:
        a, b = plain[sd], piped[sd]
        assert [o.name for o in a.objects] == [o.name for o in b.objects]
        for oa, ob in zip(a.objects, b.objects):
            # Chunked batches change the job-batch size -> float
            # reassociation can flip a borderline LCP inlier (1/1024).
            np.testing.assert_allclose(ob.score, oa.score, atol=3e-3)
            np.testing.assert_allclose(ob.pose_cam, oa.pose_cam, atol=5e-4)
            np.testing.assert_allclose(ob.pose_world, oa.pose_world, atol=5e-4)
        assert b.timings["pipelined"] is True
        assert b.timings["scenes_per_sec"] > 0


def test_batched_prepare_matches_serial(db):
    # prepare_scenes (one vmapped program per stage) must reproduce the
    # serial prepare_scene exactly: same per-scene key flow, so table pose,
    # cleaned depth, segment clouds, and generation keys all agree.
    import jax.numpy as jnp

    serial = scene_sweep.prepare_scene(SCENE, db, cfg=SMALL_CFG, seed=0)
    batched = scene_sweep.prepare_scenes([SCENE], db, cfg=SMALL_CFG, seed=0)[0]
    np.testing.assert_array_equal(serial.gen_keys, batched.gen_keys)
    np.testing.assert_allclose(
        np.asarray(serial.table_pose), batched.table_pose, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(serial.depth_clean), batched.depth_clean, atol=1e-5
    )
    for field in ("pts", "nrm", "prob", "mask"):
        a = np.asarray(getattr(serial.segs, field))
        b = np.asarray(getattr(batched.segs, field))
        np.testing.assert_allclose(a, b, atol=1e-5)
