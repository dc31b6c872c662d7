"""Contract tests for the transfer-randomized scene generator.

render_scene_transfer (utils/synthdata.py) exists to remove every
color-class correlation from FCN training data (the palette-trained nets'
measured real-frame transfer was mIoU 0.14/0.02 -
WHOLE_SCENE_BENCH.json fcn_real_frame_miou): the net must key on shape and
size. These tests pin the generator's data contract; the training result is
measured separately (scripts/train_fcn.py --appearance transfer).
"""

import numpy as np
import pytest

from physimglobalpose_tpu.models import assets, objectdb
from physimglobalpose_tpu.utils import synthdata

from tests.test_e2e_scene import MODELS, OBJ_CFG, SMALL_CFG

OBJECTS = {
    "kleenex_tissue_box": 8,
    "expo_dry_erase_board_eraser": 2,
    "folgers_classic_roast_coffee": 3,
}
INTR = np.array(
    [[307.0, 0.0, 160.0], [0.0, 307.0, 120.0], [0.0, 0.0, 1.0]], np.float32
)


@pytest.fixture(scope="module")
def meshes():
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=SMALL_CFG, cache_dir="/tmp/ppf_cache",
        only=list(OBJECTS),
    )
    return {n: assets.decimate_to_max_faces(db[n].mesh, 2000) for n in OBJECTS}


def test_transfer_scene_contract(meshes):
    rng = np.random.default_rng(3)
    color, label, poses, depth = synthdata.render_scene_transfer(
        meshes, OBJECTS, rng, INTR, 240, 320
    )
    assert color.shape == (240, 320, 3) and color.dtype == np.uint8
    assert label.shape == (240, 320) and depth.shape == (240, 320)
    # Every placed object is visibly labeled; ids come from OBJECTS.
    placed = {OBJECTS[n] for n in poses}
    assert set(np.unique(label)) - {0} == placed
    # min_visible_px is checked at placement time; a LATER object may still
    # occlude part of an earlier one, so gate looser here.
    for c in placed:
        assert (label == c).sum() >= 50
    # Object pixels carry valid depth; poses are CAMERA frame (in front of
    # the camera, i.e. +z translation within the working distance).
    assert (depth[label > 0] > 0.1).all()
    for pose in poses.values():
        assert 0.3 < pose[2, 3] < 2.0


def test_transfer_appearance_is_class_agnostic(meshes):
    # The HUE of a class across scenes must NOT be stable: the palette
    # generator keys class->color (that is its failure mode on real
    # imagery); the transfer generator redraws instance colors every scene.
    # Mean RGB washes toward gray on multi-color pattern instances (hue of
    # gray is noise), so the statistic is the DOMINANT color's hue
    # (mode over a 3x3x3 RGB-cube quantization), kept only when saturated.
    import colorsys

    def dominant_hues(render, n_scenes):
        out = []
        for s in range(n_scenes):
            rng = np.random.default_rng(100 + s)
            color, label, _, _ = render(rng)
            sel = label == OBJECTS["folgers_classic_roast_coffee"]
            if sel.sum() < 100:
                continue
            px = color[sel].astype(np.float32) / 255.0
            q = np.clip((px * 3).astype(int), 0, 2)
            bins = q[:, 0] * 9 + q[:, 1] * 3 + q[:, 2]
            dom = np.bincount(bins, minlength=27).argmax()
            m = px[bins == dom].mean(0)
            hue, sat, _ = colorsys.rgb_to_hsv(*m)
            if sat > 0.25:
                out.append(hue)
        return np.asarray(out)

    def circ_std(h):
        a = 2 * np.pi * h
        return float(np.sqrt(-2 * np.log(np.abs(np.exp(1j * a).mean()))))

    transfer = dominant_hues(
        lambda rng: synthdata.render_scene_transfer(
            meshes, OBJECTS, rng, INTR, 240, 320),
        14,
    )
    palette = dominant_hues(
        lambda rng: synthdata.render_scene(
            meshes, OBJECTS, rng, INTR, 240, 320),
        14,
    )
    assert len(transfer) >= 5 and len(palette) >= 5
    assert circ_std(palette) < 0.15, f"palette hue drifts: {circ_std(palette):.3f}"
    assert circ_std(transfer) > 0.3, (
        f"transfer hue too stable (class-color correlation): "
        f"{circ_std(transfer):.3f}"
    )


def test_prior_appearance_keys_product_colors(meshes):
    # With color_priors the folgers instances must be measurably REDDER than
    # kleenex instances across scenes (the product prior restores the
    # color-class correlation real packaging has; ROUND4_NOTES 7b) - the
    # opposite contract of test_transfer_appearance_is_class_agnostic.
    # The statistic is comparative redness (R - max(G,B)), which survives
    # the generator's exposure/desaturation/palette-roll jitter that makes
    # any absolute-hue gate flaky.
    f_red, k_red = [], []
    for s in range(16):
        rng = np.random.default_rng(200 + s)
        color, label, _, _ = synthdata.render_scene_transfer(
            meshes, OBJECTS, rng, INTR, 240, 320,
            color_priors=synthdata.PRODUCT_COLOR_PRIORS,
        )
        for name, acc in (("folgers_classic_roast_coffee", f_red),
                          ("kleenex_tissue_box", k_red)):
            sel = label == OBJECTS[name]
            if sel.sum() < 100:
                continue
            px = color[sel].astype(np.float32) / 255.0
            acc.append(float((px[:, 0] - px[:, 1:].max(1)).mean()))
    assert len(f_red) >= 6 and len(k_red) >= 6
    fm, km = float(np.mean(f_red)), float(np.mean(k_red))
    # Folgers (red can) must be redder than kleenex (light-blue box) on
    # average, by a margin the class-agnostic generator cannot produce.
    assert fm > km + 0.05, f"prior lost product color keying: {fm:.3f} vs {km:.3f}"
    assert km < 0.02, f"kleenex reads red: {km:.3f}"


def test_transfer_background_split(meshes):
    # Oblique camera: the frame has both a table region and a shelf/sky
    # region, and the table is brighter on average (the APC rig look).
    rng = np.random.default_rng(11)
    color, label, _, depth = synthdata.render_scene_transfer(
        meshes, OBJECTS, rng, INTR, 240, 320
    )
    bg = label == 0
    sky = bg & (depth <= 0)
    table = bg & (depth > 0)
    assert sky.sum() > 500 and table.sum() > 500
    lum = color.astype(np.float32).mean(-1)
    assert lum[table].mean() > lum[sky].mean()
