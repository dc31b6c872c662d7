"""Learned object detection network (the Faster-RCNN service slot).

Reference: the RCNN segmentation strategies call a Caffe Faster-RCNN ROS
service (rcnn_detection_package/bin/detect_bbox:24-39) whose `detect`
returns, per requested class, the TOP-9 boxes by class score
(recognition.py:27-61); Segmentation.cpp:25-94 turns the winning box into a
rectangular probability mask.

TPU design: a two-stage detector is RPN->ROI-gather->per-ROI head - gathers
and dynamic ROI counts that fight XLA. A single-shot anchor-free head
(CenterNet semantics: per-class center heatmap + box size regression at
stride 8) produces the same contract - scored per-class boxes - as ONE
static-shape jitted forward: conv backbone -> [H/8, W/8, C] center logits +
[H/8, W/8, 2] log-sizes; decoding is a 3x3 max-pool peak NMS and a static
top-k per class, all on device. Trained on the framework's own synthetic
renders with box targets derived from the GT instance masks
(scripts/train_detector.py), exactly like the FCN zoo checkpoints.
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
import numpy as np

STRIDE = 8


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", dtype=self.dtype, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        return nn.relu(x)


class CenterNetDetector(nn.Module):
    """Anchor-free single-shot detector at stride 8.

    Heads: `heat` [B, H/8, W/8, num_classes] center logits and `size`
    [B, H/8, W/8, 2] log box sizes in stride units. num_classes counts
    OBJECT classes only (class id c maps to channel c-1; background has no
    channel - absence of peaks is the background).
    """

    num_classes: int
    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        w = self.width
        x = ConvBlock(w, 1, self.dtype)(x)          # /1
        x = ConvBlock(w, 2, self.dtype)(x)          # /2
        x = ConvBlock(w * 2, 1, self.dtype)(x)
        x = ConvBlock(w * 2, 2, self.dtype)(x)      # /4
        x = ConvBlock(w * 4, 1, self.dtype)(x)
        x = ConvBlock(w * 4, 2, self.dtype)(x)      # /8
        x = ConvBlock(w * 4, 1, self.dtype)(x)
        x = ConvBlock(w * 4, 1, self.dtype)(x)
        heat = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="heat")(x)
        size = nn.Conv(2, (1, 1), dtype=jnp.float32, name="size")(x)
        return heat, size


# ------------------------------------------------------------------ targets


def make_targets(label: np.ndarray, num_classes: int):
    """Training targets from a GT class-id mask [H, W].

    Returns (heat [H/8, W/8, num_classes] gaussian center map,
    size [H/8, W/8, 2] log stride-unit sizes, pos [H/8, W/8] center mask).
    One box per class present (the scenes place one instance per class, as
    the reference's APC setting does - Segmentation.cpp keeps one box per
    class too).
    """
    h, w = label.shape
    gh, gw = h // STRIDE, w // STRIDE
    heat = np.zeros((gh, gw, num_classes), np.float32)
    size = np.zeros((gh, gw, 2), np.float32)
    pos = np.zeros((gh, gw), bool)
    for cid in np.unique(label):
        if cid == 0 or cid > num_classes:
            continue
        ys, xs = np.nonzero(label == cid)
        if len(ys) < 8:
            continue
        x1, x2, y1, y2 = xs.min(), xs.max(), ys.min(), ys.max()
        bw, bh = (x2 - x1 + 1) / STRIDE, (y2 - y1 + 1) / STRIDE
        cx = min(int((x1 + x2) / 2 / STRIDE), gw - 1)
        cy = min(int((y1 + y2) / 2 / STRIDE), gh - 1)
        # CenterNet gaussian: radius ~ box size / 3 (their min-IoU 0.7 rule
        # simplified; these scenes have well-separated single instances).
        sigma = max(1.0, min(bw, bh) / 3.0)
        yy, xx = np.mgrid[0:gh, 0:gw]
        g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma ** 2))
        heat[:, :, cid - 1] = np.maximum(heat[:, :, cid - 1], g)
        size[cy, cx] = [np.log(max(bw, 1e-3)), np.log(max(bh, 1e-3))]
        pos[cy, cx] = True
    return heat, size, pos


def detector_loss(heat_logits, size_pred, heat_tgt, size_tgt, pos_mask):
    """CenterNet penalty-reduced focal loss + L1 size loss at centers."""
    p = jax.nn.sigmoid(heat_logits)
    eps = 1e-6
    is_center = heat_tgt >= 0.999
    pos_loss = -jnp.log(p + eps) * (1 - p) ** 2 * is_center
    neg_loss = (
        -jnp.log(1 - p + eps) * p ** 2 * (1 - heat_tgt) ** 4 * (~is_center)
    )
    n_pos = jnp.maximum(jnp.sum(is_center), 1.0)
    heat_loss = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos
    size_loss = jnp.sum(
        jnp.abs(size_pred - size_tgt) * pos_mask[..., None]
    ) / jnp.maximum(jnp.sum(pos_mask), 1.0)
    return heat_loss + 0.5 * size_loss


def make_train_step(model: nn.Module, tx):
    import optax

    def loss_fn(params, images, heat_tgt, size_tgt, pos_mask):
        heat, size = model.apply({"params": params}, images)
        return detector_loss(heat, size, heat_tgt, size_tgt, pos_mask)

    def train_step(params, opt_state, images, heat_tgt, size_tgt, pos_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, heat_tgt, size_tgt, pos_mask
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


# ------------------------------------------------------------------ decoding


def decode_boxes(heat_logits, size_pred, top: int = 9):
    """Per-class top-k peak decoding, all static shapes.

    heat_logits [gh, gw, C], size_pred [gh, gw, 2] -> per class `top` boxes:
    (boxes [C, top, 4] pixel tl_x, tl_y, br_x, br_y; scores [C, top]).
    Peak NMS is the CenterNet 3x3 max-pool trick - a point survives iff it
    is its neighborhood maximum (replaces the reference's box-IoU NMS
    kernels, rcnn lib/nms/*, with one fused pooling op).
    """
    gh, gw, c = heat_logits.shape
    p = jax.nn.sigmoid(heat_logits)
    pooled = nn.max_pool(p[None], (3, 3), strides=(1, 1), padding="SAME")[0]
    peaks = jnp.where(p >= pooled, p, 0.0)  # [gh, gw, C]
    flat = peaks.reshape(gh * gw, c).T  # [C, gh*gw]
    scores, idx = jax.lax.top_k(flat, top)  # [C, top]
    cy, cx = idx // gw, idx % gw
    sz = jnp.exp(size_pred.reshape(gh * gw, 2))[idx]  # [C, top, 2]
    bw, bh = sz[..., 0], sz[..., 1]
    x = (cx.astype(jnp.float32) + 0.5) * STRIDE
    y = (cy.astype(jnp.float32) + 0.5) * STRIDE
    boxes = jnp.stack(
        [
            x - bw * STRIDE / 2, y - bh * STRIDE / 2,
            x + bw * STRIDE / 2, y + bh * STRIDE / 2,
        ],
        axis=-1,
    )
    return boxes, scores


# ------------------------------------------------------------- serving layer

_SHIPPED = "detector_synth_apc.npz"
NUM_CLASSES = 11  # APC object classes (ids 1..11; channel = id - 1)


def shipped_checkpoint_path() -> str:
    return os.path.join(os.path.dirname(__file__), "weights", _SHIPPED)


# Checkpoint IO: the FCN zoo's flat-npz format (models/fcn.py), one format
# for every shipped network.
from physimglobalpose_tpu.models.fcn import (  # noqa: E402
    load_params_npz, save_params_npz,
)


def make_box_predictor(model: nn.Module, params, input_size=(480, 640),
                       top: int = 9):
    """One jitted forward+decode: color [H, W, 3] u8 -> (boxes, scores).

    Matches recognition.py:27-61 semantics: per class, the top `top` scored
    boxes (the reference returns its Faster-RCNN's 9 best per class). Weights
    are a traced ARGUMENT (remote-compile backends reject giant constant
    uploads; same fix as fcn.make_predictor).
    """
    hh, ww = input_size

    @jax.jit
    def _run(p, img_u8):
        img = img_u8.astype(jnp.float32) / 255.0
        img = jax.image.resize(img, (hh, ww, 3), "bilinear")
        heat, size = model.apply({"params": p}, img[None])
        return decode_boxes(heat[0], size[0], top=top)

    params_dev = jax.tree.map(jnp.asarray, params)

    def predict(color: np.ndarray):
        h0, w0 = color.shape[:2]
        boxes, scores = _run(params_dev, jnp.asarray(color))
        boxes = np.asarray(boxes, np.float64)
        boxes[..., 0::2] *= w0 / ww
        boxes[..., 1::2] *= h0 / hh
        np.clip(boxes[..., 0::2], 0, w0 - 1, out=boxes[..., 0::2])
        np.clip(boxes[..., 1::2], 0, h0 - 1, out=boxes[..., 1::2])
        return boxes, np.asarray(scores)

    return predict


def load_shipped_box_predictor(input_size=None, top: int = 9):
    """Serve the shipped synthetic-trained detector checkpoint.

    input_size defaults to the checkpoint's training resolution (meta
    "input_size"); inputs of any size are resized in and boxes scaled back
    out by make_box_predictor.
    """
    path = shipped_checkpoint_path()
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no shipped detector checkpoint at {path}; train one with "
            "scripts/train_detector.py"
        )
    params, meta = load_params_npz(path)
    meta = meta or {}
    if input_size is None:
        input_size = tuple(meta.get("input_size", (240, 320)))
    model = CenterNetDetector(
        num_classes=meta.get("num_classes", NUM_CLASSES),
        width=meta.get("width", 32),
    )
    return make_box_predictor(model, params, input_size=input_size, top=top)
