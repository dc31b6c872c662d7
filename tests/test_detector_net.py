"""Learned detection network (models/detect.py, the Faster-RCNN slot).

Unit gates: mask->target construction, peak decoding as the inverse of
target construction, the recognition.py top-9-per-class contract, and the
detector callable the segmentation strategies consume. The shipped-weights
quality gate runs when the checkpoint is present (scripts/train_detector.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from physimglobalpose_tpu.models import detect
from physimglobalpose_tpu.pipeline.detector import make_learned_detector


def test_make_targets_center_and_size():
    label = np.zeros((240, 320), np.int32)
    label[60:120, 80:200] = 3  # 60x120 box, center (140, 90)
    heat, size, pos = detect.make_targets(label, detect.NUM_CLASSES)
    gh, gw = 240 // detect.STRIDE, 320 // detect.STRIDE
    assert heat.shape == (gh, gw, detect.NUM_CLASSES)
    cy, cx = np.unravel_index(np.argmax(heat[:, :, 2]), (gh, gw))
    # GT box [80, 200) x [60, 120) -> center (139.5, 89.5) -> cell (11, 17).
    assert (cy, cx) == (int(89.5 / detect.STRIDE), int(139.5 / detect.STRIDE))
    assert pos[cy, cx]
    bw, bh = np.exp(size[cy, cx])
    np.testing.assert_allclose(bw * detect.STRIDE, 120, atol=detect.STRIDE)
    np.testing.assert_allclose(bh * detect.STRIDE, 60, atol=detect.STRIDE)
    # Other classes stay empty.
    assert heat[:, :, 0].max() == 0.0


def test_decode_inverts_targets():
    label = np.zeros((240, 320), np.int32)
    label[60:120, 80:200] = 3
    label[150:200, 30:90] = 8
    heat, size, _pos = detect.make_targets(label, detect.NUM_CLASSES)
    # Perfect-logit decode: logits = logit(heat clipped).
    h = np.clip(heat, 1e-5, 1 - 1e-5)
    logits = np.log(h / (1 - h))
    boxes, scores = jax.jit(detect.decode_boxes, static_argnames="top")(
        jnp.asarray(logits), jnp.asarray(size), top=9
    )
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    assert boxes.shape == (detect.NUM_CLASSES, 9, 4)
    assert scores.shape == (detect.NUM_CLASSES, 9)
    for cid, gt in [(3, (80, 60, 199, 119)), (8, (30, 150, 89, 199))]:
        bx = boxes[cid - 1, 0]
        assert scores[cid - 1, 0] > 0.9
        np.testing.assert_allclose(bx, gt, atol=1.5 * detect.STRIDE)
    # Per-class ranking: the top-1 peak dominates its own channel.
    assert scores[2, 0] >= scores[2, 1]


def test_forward_shapes_and_jit():
    model = detect.CenterNetDetector(num_classes=detect.NUM_CLASSES, width=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 96, 128, 3)))["params"]
    heat, size = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        params, jnp.zeros((2, 96, 128, 3))
    )
    assert heat.shape == (2, 12, 16, detect.NUM_CLASSES)
    assert size.shape == (2, 12, 16, 2)
    assert heat.dtype == jnp.float32


def test_train_step_reduces_loss():
    rng = np.random.default_rng(0)
    label = np.zeros((96, 128), np.int32)
    label[30:60, 40:90] = 2
    heat, size, pos = detect.make_targets(label, detect.NUM_CLASSES)
    img = rng.uniform(size=(1, 96, 128, 3)).astype(np.float32)
    model = detect.CenterNetDetector(num_classes=detect.NUM_CLASSES, width=8)
    params = model.init(jax.random.key(0), jnp.zeros((1, 96, 128, 3)))["params"]
    import optax

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(detect.make_train_step(model, tx))
    args = (jnp.asarray(img), jnp.asarray(heat[None]),
            jnp.asarray(size[None]), jnp.asarray(pos[None]))
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_learned_detector_callable_contract():
    # Fake box predictor: class 3 strong at a known box, class 8 weak.
    def fake_predictor(color):
        boxes = np.zeros((detect.NUM_CLASSES, 9, 4))
        scores = np.zeros((detect.NUM_CLASSES, 9))
        boxes[2, 0] = [10, 20, 100, 120]
        scores[2, 0] = 0.9
        scores[7, 0] = 0.01  # below min_score
        return boxes, scores

    det = make_learned_detector(box_predictor=fake_predictor)
    out = det(np.zeros((240, 320, 3), np.uint8), [3, 8], fcn_fallback=False)
    assert out == {3: (10, 20, 100, 120)}


@pytest.mark.skipif(
    not os.path.exists(detect.shipped_checkpoint_path()),
    reason="detector checkpoint missing (run scripts/train_detector.py)",
)
def test_shipped_detector_boxes_on_synthetic_scene():
    from physimglobalpose_tpu.models import assets, objectdb
    from physimglobalpose_tpu.utils import synthdata

    OBJECTS = {
        "kleenex_tissue_box": 8,
        "expo_dry_erase_board_eraser": 2,
        "folgers_classic_roast_coffee": 3,
    }
    db = objectdb.load_object_db(
        "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml",
        "/root/reference/src/physim_pose_estimation/models_visualization",
        cache_dir="/tmp/ppf_cache", only=list(OBJECTS),
    )
    meshes = {n: assets.decimate_to_max_faces(db[n].mesh, 2000)
              for n in OBJECTS}
    intr = np.array(
        [[307.0, 0, 160.0], [0, 307.0, 120.0], [0, 0, 1.0]], np.float32
    )
    det = make_learned_detector()
    # Statistical gate over held-out scenes (the checkpoint's measured
    # held-out recall@0.5 is ~0.9 - a single draw can legitimately contain
    # one class confusion; SYNTH_EVAL "rcnn" carries the full numbers).
    good, total = 0, 0
    for seed in (7, 8, 9):
        rng = np.random.default_rng(seed)
        color, label, _, _ = synthdata.render_scene(
            meshes, OBJECTS, rng, intr, 240, 320
        )
        out = det(color, sorted(OBJECTS.values()))
        for cid in sorted(OBJECTS.values()):
            ys, xs = np.nonzero(label == cid)
            if len(ys) < 8:  # object absent/out of frame in this draw
                continue
            total += 1
            if cid not in out:
                continue
            box = out[cid]
            gt = (xs.min(), ys.min(), xs.max(), ys.max())
            ix1, iy1 = max(gt[0], box[0]), max(gt[1], box[1])
            ix2, iy2 = min(gt[2], box[2]), min(gt[3], box[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a = (gt[2] - gt[0]) * (gt[3] - gt[1]) + max(
                box[2] - box[0], 0
            ) * max(box[3] - box[1], 0) - inter
            good += inter / max(a, 1e-6) > 0.35
    assert good >= total - 2, f"only {good}/{total} instances localized"
