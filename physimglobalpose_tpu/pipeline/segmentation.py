"""Segmentation strategies: per-object probability images + 3D segments.

Reference (Segmentation.cpp): five strategies selected by request string -
GT (class mask -> prob 1.0 inside the object, :187-206), FCN / FCNThreshold
(NN service prob maps, background gate < 0.8, :96-182), RCNN / RCNNThreshold
(detector boxes -> rectangular masks, :25-94). compute3dSegment (:211-252)
converts mask x depth into a voxel-downsampled cloud with normals.

Here each strategy produces a float prob image [H, W] per requested object;
compute_3d_segment is one jitted function: crop -> 1 cm voxel (probabilities
averaged alongside) -> radius outlier removal -> k-NN PCA normals flipped to
the viewpoint. NN-based strategies take a callable predictor so the Flax FCN
(models/fcn.py) or any precomputed masks plug in without touching this layer.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Sequence

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.config import PipelineConfig, DEFAULT_CONFIG
from physimglobalpose_tpu.geometry import pointcloud
from physimglobalpose_tpu.ops import normals as normals_mod
from physimglobalpose_tpu.ops import voxel


class Segment3D(NamedTuple):
    """Fixed-size 3D segment of one object (the StoCS input)."""

    pts: jnp.ndarray  # [N, 3]
    nrm: jnp.ndarray  # [N, 3]
    prob: jnp.ndarray  # [N]
    mask: jnp.ndarray  # [N] bool


def gt_prob_images(
    class_mask: np.ndarray, class_ids: Sequence[int]
) -> Dict[int, np.ndarray]:
    """GT strategy: probability 1.0 where the class mask matches.

    (The reference writes 10000 into a 16-bit prob PNG = probability 1.0,
    Segmentation.cpp:187-206.)
    """
    return {c: (class_mask == c).astype(np.float32) for c in class_ids}


def threshold_prob_images(
    prob_maps: Dict[int, np.ndarray],
    background_prob: np.ndarray,
    threshold: float = 0.8,
) -> Dict[int, np.ndarray]:
    """FCNThreshold strategy: FLAT 1.0 mask where the class has any
    probability and the background class is not confident - the reference
    sets objMask = 1.0, not the soft value (Segmentation.cpp:165-175), so
    the downstream StoCS prior is uniform inside the mask. (Carrying the
    max-normalized soft values through instead measurably biased base
    sampling onto activation hotspots - FCN_POSE_DIAG.json.)"""
    out = {}
    for c, p in prob_maps.items():
        out[c] = np.where(
            (p > 0) & (background_prob < threshold), 1.0, 0.0
        ).astype(np.float32)
    return out


def bbox_prob_images(
    boxes: Dict[int, tuple], height: int, width: int, scores: Dict[int, float] | None = None
) -> Dict[int, np.ndarray]:
    """RCNN strategy: filled rectangles from detector boxes
    (Segmentation.cpp:25-94). boxes[c] = (tl_x, tl_y, br_x, br_y)."""
    out = {}
    for c, (tlx, tly, brx, bry) in boxes.items():
        img = np.zeros((height, width), np.float32)
        img[int(tly) : int(bry) + 1, int(tlx) : int(brx) + 1] = (
            scores.get(c, 1.0) if scores else 1.0
        )
        out[c] = img
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def compute_3d_segment(
    depth: jnp.ndarray,
    prob_img: jnp.ndarray,
    intrinsics: jnp.ndarray,
    key: jax.Array,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> Segment3D:
    """mask x depth -> fixed-size segment cloud with normals + probabilities.

    Mirrors compute3dSegment (1 cm voxel + MLS normals, Segmentation.cpp:211-252)
    and the generation-stage preconditioning (radius outlier removal + normal
    flip toward viewpoint, ObjectPoseCandidateSet.cpp:28-51).
    """
    pre = cfg.preprocess
    n_out = pre.max_segment_points
    k1, _ = jax.random.split(key)
    # Oversample the raw crop 4x before voxel thinning.
    raw_pts, raw_prob, raw_mask = pointcloud.crop_segment(
        depth,
        prob_img,
        intrinsics,
        max_points=4 * n_out,
        key=k1,
        depth_min=pre.depth_min,
        depth_max=pre.depth_max,
    )
    vox_pts, vox_mask, vox_prob = voxel.voxel_downsample(
        raw_pts, raw_mask, pre.segment_voxel, n_out, extras=raw_prob[:, None]
    )
    vox_prob = vox_prob[:, 0]
    keep = normals_mod.radius_outlier_mask(
        vox_pts, vox_mask, pre.outlier_radius, pre.outlier_min_neighbors
    )
    nrm = normals_mod.knn_normals(vox_pts, keep, k=pre.normal_k)
    return Segment3D(
        pts=jnp.where(keep[:, None], vox_pts, 0.0),
        nrm=nrm,
        prob=jnp.where(keep, vox_prob, 0.0),
        mask=keep,
    )


def segment_count(seg: Segment3D) -> jnp.ndarray:
    return jnp.sum(seg.mask)


PROB_STRATEGIES = ("GT", "FCN", "FCNThreshold", "RCNN", "RCNNThreshold")


def build_prob_images(
    strategy: str,
    class_ids: Sequence[int],
    class_mask: np.ndarray | None = None,
    nn_predictor: Callable[[np.ndarray, Sequence[int]], Dict[int, np.ndarray]] | None = None,
    color: np.ndarray | None = None,
    background_prob: np.ndarray | None = None,
    detector: Callable[[np.ndarray, Sequence[int]], Dict[int, tuple]] | None = None,
    threshold: float = 0.8,
) -> Dict[int, np.ndarray]:
    """Strategy dispatch (SceneCfg::perfromSegmentation, SceneCfg.cpp:356-372)."""
    if strategy == "GT":
        if class_mask is None:
            raise ValueError("GT segmentation needs a class mask")
        return gt_prob_images(class_mask, class_ids)
    if strategy in ("FCN", "FCNThreshold"):
        if nn_predictor is None or color is None:
            raise ValueError("FCN segmentation needs a predictor and color image")
        probs = nn_predictor(color, class_ids)
        # Sentinel outputs of fcn.make_predictor (absent from injected test
        # predictors, which then use the derived fallbacks below).
        label = probs.get(-1)  # fcn.PREDICTOR_LABEL_KEY: argmax class image
        bg = probs.get(-2)  # fcn.PREDICTOR_BACKGROUND_KEY: background map
        if strategy == "FCNThreshold":
            if background_prob is None:
                if bg is not None:
                    # The reference gate reads the NET's background channel
                    # (background.png, Segmentation.cpp:165-175) - the
                    # derived 1-max form below over-admits badly: per-class
                    # maps are max-NORMALIZED (predict:107-117 parity), so a
                    # weakly-activated class still peaks at 1 and pushes the
                    # derived background under the 0.8 gate almost
                    # everywhere (measured 71-83% false-positive mask pixels
                    # on the real frame, FCN_POSE_DIAG.json).
                    background_prob = bg
                else:
                    stacked = np.stack([probs[c] for c in class_ids])
                    background_prob = 1.0 - stacked.max(axis=0)
            return threshold_prob_images(
                {c: probs[c] for c in class_ids}, background_prob, threshold
            )
        # Plain FCN: the reference consumes the ARGMAX class image and sets
        # a FLAT 1.0 mask per object (Segmentation.cpp:118-131) - pixels are
        # mutually exclusive across classes and the StoCS prior is uniform
        # inside the mask. (Soft per-class probabilities were measurably
        # WORSE as a prior: max-normalized maps weighted StoCS bases onto
        # activation hotspots and broke the thin-object pose on the real
        # frame - FCN_POSE_DIAG.json fcn_gtsup vs gt_flat.)
        if label is not None:
            return {c: (label == c).astype(np.float32) for c in class_ids}
        return {c: np.where(probs[c] >= 0.15, 1.0, 0.0).astype(np.float32)
                for c in class_ids}
    if strategy in ("RCNN", "RCNNThreshold"):
        if detector is None or color is None:
            raise ValueError("RCNN segmentation needs a detector and color image")
        boxes = detector(color, class_ids)
        out = bbox_prob_images(boxes, color.shape[0], color.shape[1])
        # Undetected classes get an empty mask (the pipeline returns identity
        # for degenerate segments, like the reference's <30-point bail).
        for c in class_ids:
            out.setdefault(c, np.zeros(color.shape[:2], np.float32))
        return out
    raise ValueError(f"unknown segmentation strategy {strategy!r}")
