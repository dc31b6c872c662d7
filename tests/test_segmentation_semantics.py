"""Reference-parity semantics of the FCN mask construction (r5, VERDICT #3).

The serving node ships three outputs per frame (predict:103-155): per-class
max-normalized probability maps, the argmax class image, and the background
channel map. Segmentation.cpp consumes them as:
- plain FCN: objMask = 1.0 where argmax == class (118-131) - FLAT masks,
  mutually exclusive across classes;
- FCNThreshold: objMask = 1.0 where the class map is nonzero AND the NET's
  background channel < 0.8 (165-175) - also flat.
Soft per-class values never ride downstream (carrying them measurably broke
StoCS base sampling on the real frame - FCN_POSE_DIAG.json).
"""
import numpy as np

from physimglobalpose_tpu.models import fcn
from physimglobalpose_tpu.pipeline import segmentation


def _predictor_with_sentinels(prob_by_class, label, bg):
    def predictor(color, wanted_ids):
        out = {c: prob_by_class[c] for c in wanted_ids}
        out[fcn.PREDICTOR_LABEL_KEY] = label
        out[fcn.PREDICTOR_BACKGROUND_KEY] = bg
        return out
    return predictor


def test_plain_fcn_uses_flat_argmax_masks():
    h, w = 4, 6
    p1 = np.full((h, w), 0.7, np.float32)
    p2 = np.full((h, w), 0.9, np.float32)
    label = np.zeros((h, w), np.int32)
    label[:, :3] = 1
    label[:, 3:] = 2
    bg = np.zeros((h, w), np.float32)
    pred = _predictor_with_sentinels({1: p1, 2: p2}, label, bg)
    out = segmentation.build_prob_images(
        "FCN", [1, 2], nn_predictor=pred, color=np.zeros((h, w, 3), np.uint8)
    )
    # Flat 1.0 inside the argmax region, 0 outside - soft values discarded.
    assert set(np.unique(out[1])) <= {0.0, 1.0}
    assert out[1][:, :3].all() and not out[1][:, 3:].any()
    assert out[2][:, 3:].all() and not out[2][:, :3].any()
    # Mutually exclusive across classes.
    assert not np.logical_and(out[1] > 0, out[2] > 0).any()


def test_fcn_threshold_gates_on_net_background_channel():
    h, w = 4, 6
    p1 = np.zeros((h, w), np.float32)
    p1[:, :4] = 0.6          # class activation (soft, max-normalized)
    bg = np.zeros((h, w), np.float32)
    bg[:, 2:] = 0.95         # background confident on the right side
    label = np.zeros((h, w), np.int32)
    pred = _predictor_with_sentinels({1: p1}, label, bg)
    out = segmentation.build_prob_images(
        "FCNThreshold", [1], nn_predictor=pred,
        color=np.zeros((h, w, 3), np.uint8), threshold=0.8,
    )
    # objMask = 1.0 where p>0 AND bg<0.8 (cols 0:2); flat, not the 0.6.
    assert set(np.unique(out[1])) <= {0.0, 1.0}
    assert out[1][:, :2].all()
    assert not out[1][:, 2:].any()


def test_fcn_threshold_derived_background_fallback():
    # Predictors without the sentinel outputs (injected test predictors)
    # fall back to bg = 1 - max(class probs).
    h, w = 3, 4
    p1 = np.zeros((h, w), np.float32)
    p1[:, :2] = 0.9          # derived bg 0.1 < 0.8 -> admitted
    out = segmentation.build_prob_images(
        "FCNThreshold", [1],
        nn_predictor=lambda c, ids: {1: p1},
        color=np.zeros((h, w, 3), np.uint8), threshold=0.8,
    )
    assert out[1][:, :2].all() and not out[1][:, 2:].any()


def test_plain_fcn_fallback_thresholds_soft_maps():
    # No argmax sentinel: gate at 0.15 and still emit FLAT masks.
    h, w = 3, 4
    p1 = np.zeros((h, w), np.float32)
    p1[:, 0] = 0.5
    p1[:, 1] = 0.1           # below the 0.15 gate
    out = segmentation.build_prob_images(
        "FCN", [1],
        nn_predictor=lambda c, ids: {1: p1},
        color=np.zeros((h, w, 3), np.uint8),
    )
    assert set(np.unique(out[1])) <= {0.0, 1.0}
    assert out[1][:, 0].all() and not out[1][:, 1:].any()
