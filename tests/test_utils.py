"""Tests for auxiliary subsystems: tracing, checkpoint, segdata, viz, detector."""

import json

import numpy as np

from physimglobalpose_tpu.utils import checkpoint, segdata, tracing, viz


def test_tracer_spans_nest():
    tr = tracing.Tracer()
    with tracing.trace_span(tr, "outer"):
        with tracing.trace_span(tr, "inner"):
            pass
    assert len(tr.roots) == 1
    assert tr.roots[0].name == "outer"
    assert tr.roots[0].children[0].name == "inner"
    flat = tr.flat_timings()
    assert "outer" in flat and "outer/inner" in flat
    parsed = json.loads(tr.to_json())
    assert parsed[0]["name"] == "outer"


def test_search_snapshot_roundtrip(tmp_path):
    p = str(tmp_path / "snap.json")
    checkpoint.save_search_snapshot(p, "/scenes/0001", [2, 0, 1], 123.5, seed=7)
    snap = checkpoint.load_search_snapshot(p)
    assert snap["assignment"] == [2, 0, 1]
    assert snap["best_cost"] == 123.5
    assert checkpoint.load_search_snapshot(str(tmp_path / "missing.json")) is None


def test_train_state_roundtrip(tmp_path):
    import jax.numpy as jnp

    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    opt_state = {"m": jnp.full((3,), 0.5)}
    path = str(tmp_path / "ckpt")
    checkpoint.save_train_state(path, params, opt_state, step=42)
    p2, o2, step = checkpoint.load_train_state(path, params, opt_state)
    assert step == 42
    np.testing.assert_allclose(np.asarray(p2["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(o2["m"]), 0.5)


def test_segdata_batches():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8) for _ in range(4)]
    labs = [rng.integers(0, 3, size=(40, 50)).astype(np.uint8) for _ in range(4)]
    cfg = segdata.AugmentConfig(target_size=(32, 32), ignore_label=255)
    it = segdata.batches(imgs, labs, num_classes=3, batch_size=2, cfg=cfg, epochs=1)
    b_img, b_lab = next(it)
    assert b_img.shape == (2, 32, 32, 3) and b_img.dtype == np.float32
    assert b_lab.shape == (2, 32, 32) and b_lab.dtype == np.int32
    assert b_img.max() <= 1.0
    assert b_lab.max() <= 3  # ignore label remapped to num_classes


def test_segdata_pad_uses_ignore():
    rng = np.random.default_rng(1)
    img = np.zeros((10, 10, 3), np.uint8)
    lab = np.zeros((10, 10), np.uint8)
    out_img, out_lab = segdata.pad_or_crop(img, lab, (16, 16), rng, mode="none",
                                           ignore_label=255)
    assert out_lab.shape == (16, 16)
    assert (out_lab[12:, :] == 255).all()


def test_viz_overlay(tmp_path):
    color = np.zeros((48, 64, 3), np.uint8)
    intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    cloud = np.array([[0.0, 0.0, 0.5]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    out = viz.overlay_poses(color, intr, [cloud], [pose])
    assert out[24, 32].sum() > 0  # the point painted at the principal point
    viz.save_overlay(str(tmp_path / "o.png"), color, intr, [cloud], [pose])
    viz.save_depth_image(str(tmp_path / "d.png"), np.full((8, 8), 0.5, np.float32))


def test_detector_clusters():
    from physimglobalpose_tpu.pipeline import detector

    depth = np.zeros((64, 80), np.float32)
    depth[8:24, 8:28] = 0.5    # object A (bigger in pixels)
    depth[40:52, 50:62] = 0.5  # object B
    intr = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]])
    boxes = detector.depth_cluster_boxes(depth, intr, min_pixels=50)
    assert len(boxes) == 2
    (tlx, tly, brx, bry), extent = boxes[0]
    assert tlx <= 8 + 3 and tly <= 8 + 3  # covers object A
    assert 0.05 < extent < 0.2


def test_nms_boxes():
    from physimglobalpose_tpu.pipeline.detector import nms_boxes

    boxes = np.array([
        [0, 0, 10, 10],     # A
        [1, 1, 11, 11],     # overlaps A heavily
        [50, 50, 60, 60],   # B, far away
        [0, 0, 10, 10],     # duplicate of A
    ])
    scores = np.array([0.9, 0.8, 0.7, 0.95])
    keep = nms_boxes(boxes, scores, iou_threshold=0.3)
    assert list(keep)[0] == 3  # highest score first
    assert 2 in keep  # far box survives
    assert 0 not in keep and 1 not in keep  # suppressed by the duplicate


def test_fcn_detector_boxes_from_prob_maps():
    # make_fcn_detector with an injected predictor: thresholded blobs ->
    # boxes; overlapping duplicate suppressed by NMS, tiny blobs dropped.
    import numpy as np

    from physimglobalpose_tpu.pipeline import detector as det_mod

    h, w = 60, 80
    maps = {
        2: np.zeros((h, w), np.float32),
        3: np.zeros((h, w), np.float32),
        5: np.zeros((h, w), np.float32),
    }
    maps[2][10:30, 10:40] = 0.9       # solid blob
    maps[3][11:29, 11:39] = 0.6       # near-duplicate region, lower score
    maps[5][50:52, 70:72] = 0.99      # too small (< min_pixels)

    det = det_mod.make_fcn_detector(
        predictor=lambda color, ids: {c: maps[c] for c in ids},
        prob_threshold=0.5, min_pixels=50,
    )
    out = det(np.zeros((h, w, 3), np.uint8), [2, 3, 5])
    assert 2 in out
    tlx, tly, brx, bry = out[2]
    assert (tlx, tly, brx, bry) == (10, 10, 39, 29)
    assert 5 not in out  # below min_pixels
    # class 3 overlaps class 2 at IoU ~0.84 (> 0.8) -> NMS keeps the stronger
    assert 3 not in out
