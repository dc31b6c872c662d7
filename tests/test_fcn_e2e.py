"""NN-segmentation loop closure: --segmentation FCN with NO injected predictor.

VERDICT r1 item 4: the reference segments real images out of the box via
apc_weights.hdf5 (predict:59-155); here the shipped synthetic checkpoint
(scripts/train_fcn.py -> models/weights/fcn_synth_apc.npz) must drive the
full pose pipeline to correct poses on a held-out synthetic scene - masks
come from the FCN, not from GT.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from physimglobalpose_tpu.geometry import metrics
from physimglobalpose_tpu.models import assets, fcn, objectdb
from physimglobalpose_tpu.pipeline import api
from physimglobalpose_tpu.utils import synthdata

from tests.test_e2e_scene import MODELS, OBJ_CFG, SMALL_CFG

OBJECTS = {
    "kleenex_tissue_box": 8,
    "expo_dry_erase_board_eraser": 2,
    "folgers_classic_roast_coffee": 3,
}

needs_ckpt = pytest.mark.skipif(
    not os.path.exists(fcn.shipped_checkpoint_path()),
    reason="shipped FCN checkpoint missing (run scripts/train_fcn.py)",
)


@pytest.fixture(scope="module")
def db():
    return objectdb.load_object_db(
        OBJ_CFG, MODELS, config=SMALL_CFG, cache_dir="/tmp/ppf_cache",
        only=list(OBJECTS),
    )


@needs_ckpt
def test_fcn_segmentation_end_to_end(db, tmp_path):
    intr = np.array(
        [[613.998, 0.0, 320.0], [0.0, 613.998, 240.0], [0.0, 0.0, 1.0]], np.float32
    )
    meshes = {n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS}
    rng = np.random.default_rng(777)  # held out from training (seed 0)
    color, label, poses_cam, depth = synthdata.render_scene(
        meshes, OBJECTS, rng, intr, 480, 640, max_objects=2
    )
    sd = str(tmp_path / "scene")
    gt_world = synthdata.write_scene_dir(sd, color, depth, label, intr, poses_cam)

    result = api.estimate_pose(
        sd, db, dataset="APC", segmentation_mode="FCN",
        hypothesis_mode="PCS", verification_mode="LCP",
        cfg=SMALL_CFG, seed=0, write_result=False,
    )
    assert len(result.objects) == len(poses_cam)
    for est in result.objects:
        assert est.score > 0.05, f"{est.name}: no valid pose from FCN masks"
        adds = float(
            metrics.adds_error(
                jnp.asarray(est.pose_world.astype(np.float32)),
                jnp.asarray(gt_world[est.name].astype(np.float32)),
                jnp.asarray(db[est.name].validation_pts[:512]),
            )
        )
        assert adds < 0.03, f"{est.name}: ADD-S {adds:.4f} m via FCN masks"


@pytest.mark.parametrize("variant", ["small", "prior"])
def test_shipped_predictor_masks(db, variant):
    # The predictor alone: on a synthetic scene its per-class probabilities
    # must concentrate on the right pixels (IoU > 0.4 per present object).
    # "prior" trains on the harder appearance-prior distribution; gate it on
    # the domain-randomized renders. (The retired "full" checkpoint - VERDICT
    # r4 #9 - no longer ships; see models/fcn.py _SHIPPED_CKPTS.)
    if not os.path.exists(fcn.shipped_checkpoint_path(variant)):
        pytest.skip(f"{variant} FCN checkpoint missing (run scripts/train_fcn.py)")
    intr = np.array(
        [[307.0, 0.0, 160.0], [0.0, 307.0, 120.0], [0.0, 0.0, 1.0]], np.float32
    )
    meshes = {n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS}
    rng = np.random.default_rng(123)
    if variant == "prior":
        # The prior net's own training distribution (train_fcn.py
        # --appearance prior): product-color-prior packaging renders at the
        # close-camera range (ROUND4_NOTES 7b).
        color, label, _, _ = synthdata.render_scene_transfer(
            meshes, OBJECTS, rng, intr, 240, 320,
            cam_dist_range=(0.38, 0.85),
            color_priors=synthdata.PRODUCT_COLOR_PRIORS,
        )
    else:
        color, label, _, _ = synthdata.render_scene(
            meshes, OBJECTS, rng, intr, 240, 320
        )
    predictor = fcn.load_shipped_predictor(input_size=(240, 320), variant=variant)
    present = sorted(set(np.unique(label)) - {0})
    probs = predictor(color, present)
    for c in present:
        hard = probs[c] > 0.5
        gt = label == c
        iou = (hard & gt).sum() / max((hard | gt).sum(), 1)
        assert iou > 0.4, f"class {c}: IoU {iou:.2f} ({variant})"


@needs_ckpt
def test_predictor_tta_multiscale(db):
    # Multi-scale TTA predictor (fcn.make_predictor tta_scales): same output
    # contract as single-scale (per-class maps in [0,1], max-normalized to 1
    # where nonzero) and the per-class IoU gate must still hold - the fused
    # averaging must not wash out the segmentation. The real-imagery transfer
    # win itself (0.419 -> 0.469 real-frame mIoU) is measured by
    # scripts/r4_fcn_tta_probe.py; this test gates the implementation.
    intr = np.array(
        [[307.0, 0.0, 160.0], [0.0, 307.0, 120.0], [0.0, 0.0, 1.0]], np.float32
    )
    meshes = {n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS}
    rng = np.random.default_rng(123)
    color, label, _, _ = synthdata.render_scene(
        meshes, OBJECTS, rng, intr, 240, 320
    )
    predictor = fcn.load_shipped_predictor(
        input_size=(240, 320), variant="small", tta_scales=(0.5, 0.75, 1.0)
    )
    present = sorted(set(np.unique(label)) - {0})
    probs = predictor(color, present)
    for c in present:
        pm = probs[c]
        assert pm.shape == (240, 320)
        assert 0.0 <= pm.min() and pm.max() <= 1.0 + 1e-3
        assert pm.max() > 0.99  # max-normalized (predict:107-117 semantics)
        hard = pm > 0.5
        gt = label == c
        iou = (hard & gt).sum() / max((hard | gt).sum(), 1)
        assert iou > 0.4, f"class {c}: TTA IoU {iou:.2f}"


@needs_ckpt
def test_rcnn_mode_with_fcn_detector(db, tmp_path):
    # RCNN strategy with NO injected detector: the shipped FCN doubles as
    # the region scorer (reference Faster-RCNN service slot).
    intr = np.array(
        [[613.998, 0.0, 320.0], [0.0, 613.998, 240.0], [0.0, 0.0, 1.0]], np.float32
    )
    meshes = {n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS}
    rng = np.random.default_rng(555)
    color, label, poses_cam, depth = synthdata.render_scene(
        meshes, OBJECTS, rng, intr, 480, 640, max_objects=2
    )
    sd = str(tmp_path / "scene")
    gt_world = synthdata.write_scene_dir(sd, color, depth, label, intr, poses_cam)

    result = api.estimate_pose(
        sd, db, dataset="APC", segmentation_mode="RCNN",
        hypothesis_mode="PCS", verification_mode="LCP",
        cfg=SMALL_CFG, seed=0, write_result=False,
    )
    # Rectangular masks are crude; every present object must still localize
    # to within its own extent.
    assert len(result.objects) == len(poses_cam)
    ok = 0
    for est in result.objects:
        if est.score <= 0.03:
            continue
        err = np.linalg.norm(est.pose_world[:3, 3] - gt_world[est.name][:3, 3])
        if err < 0.08:
            ok += 1
    assert ok >= 1, "no object localized via FCN-backed RCNN boxes"
