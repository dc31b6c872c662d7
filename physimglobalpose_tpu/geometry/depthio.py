"""Depth / probability / mask image codecs.

Host-side I/O uses PIL + numpy (no OpenCV dependency); the bit manipulation
itself is also exposed as jax-traceable functions so decoded arrays can flow
straight onto the device.

Reference semantics (utilities.cpp):
- readDepthImage (:47-61): 16-bit PNG, APC datasets store depth bit-rotated;
  decode is d = rot16(d_raw, left=13) / 10000 meters. The rotation is a full
  16-bit circular shift: (d << 13 | d >> 3).
- writeDepthImage (:81-91): meters * 10000 -> uint16, no rotation.
- readProbImage (:66-76): 16-bit PNG / 10000 -> [0, 1] float probability.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

DEPTH_SCALE = 10000.0


def rot16_left(x: np.ndarray, k: int) -> np.ndarray:
    """16-bit circular left shift by k."""
    x = x.astype(np.uint16)
    return ((x << k) | (x >> (16 - k))).astype(np.uint16)


def decode_depth(raw: np.ndarray, bit_rotated: bool = True) -> np.ndarray:
    """uint16 raw depth image -> float32 meters.

    bit_rotated=True applies the APC encoding's rot-left-13 (utilities.cpp:56);
    pass False for plainly-encoded datasets.
    """
    raw = raw.astype(np.uint16)
    if bit_rotated:
        raw = rot16_left(raw, 13)
    return raw.astype(np.float32) / DEPTH_SCALE


def encode_depth(depth_m: np.ndarray, bit_rotated: bool = False) -> np.ndarray:
    """float32 meters -> uint16.

    bit_rotated=False matches the reference's writeDepthImage (debug dumps,
    utilities.cpp:81-91). bit_rotated=True applies the inverse of the APC
    decode rotation (rot-left-3 = rot-right-13) so the file reads back
    correctly through the APC path - use it when WRITING APC-layout scenes
    (e.g. synthetic datasets)."""
    raw = (depth_m * DEPTH_SCALE).astype(np.uint16)
    if bit_rotated:
        raw = rot16_left(raw, 3)
    return raw


def read_depth_png_raw(path: str, bit_rotated: bool = True) -> np.ndarray:
    """16-bit depth PNG -> de-rotated uint16 codec values (meters * 10000).

    The uint16 form is what goes over the host->device wire in batched
    sweeps (2 bytes/px, decoded on device); keeping it from the original
    decode avoids a float round-trip re-encode + equality check per batch.
    """
    img = np.array(Image.open(path))
    if img.dtype != np.uint16:
        img = img.astype(np.uint16)
    if bit_rotated:
        img = rot16_left(img, 13)
    return img


def read_depth_png(path: str, bit_rotated: bool = True) -> np.ndarray:
    raw = read_depth_png_raw(path, bit_rotated=bit_rotated)
    return raw.astype(np.float32) / DEPTH_SCALE


def write_depth_png(path: str, depth_m: np.ndarray, bit_rotated: bool = False) -> None:
    Image.fromarray(encode_depth(depth_m, bit_rotated=bit_rotated)).save(path)


def read_prob_png(path: str) -> np.ndarray:
    """16-bit probability PNG -> float32 in [0, ~6.5] (nominally [0,1])."""
    img = np.array(Image.open(path)).astype(np.float32)
    return img / DEPTH_SCALE


def write_prob_png(path: str, prob: np.ndarray) -> None:
    # Pillow infers I;16 from the uint16 dtype (the mode= kwarg is deprecated).
    Image.fromarray((prob * DEPTH_SCALE).astype(np.uint16)).save(path)


def read_class_mask_png(path: str) -> np.ndarray:
    """Class-id mask (uint8/uint16 single channel) -> int32 array.

    The GT segmentation path reads frame-000000.mask.png whose pixel value is
    the object class id (Segmentation.cpp:187-206).
    """
    img = np.array(Image.open(path))
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.int32)


def read_color_png(path: str) -> np.ndarray:
    """RGB color image -> uint8 [H, W, 3]."""
    return np.array(Image.open(path).convert("RGB"))
