"""Object DB: YAML parsing (APC + YCB schemas), asset prep, caching."""

import numpy as np
import pytest

from physimglobalpose_tpu.config import PipelineConfig, StoCSConfig
from physimglobalpose_tpu.models import objectdb

MESHES = "/root/reference/src/physim_pose_estimation/models_visualization"
APC_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"
YCB_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config_ycb.yml"

SMALL = PipelineConfig(
    stocs=StoCSConfig(max_pairs_per_ppf=64),
    max_model_points=256,
    max_validation_points=512,
)


def test_apc_config_parses_all():
    db = objectdb.load_object_db(APC_CFG, MESHES, config=SMALL, only=[])
    assert len(db.by_class) == 11
    assert db.by_class[8] == "kleenex_tissue_box"


def test_ycb_config_parses_all():
    db = objectdb.load_object_db(YCB_CFG, MESHES, config=SMALL, only=[])
    assert len(db.by_class) == 21
    assert db.by_class[1] == "002_master_chef_can"


def test_ycb_object_prep(tmp_path):
    db = objectdb.load_object_db(
        YCB_CFG, MESHES, config=SMALL, cache_dir=str(tmp_path),
        only=["004_sugar_box"],
    )
    obj = db["004_sugar_box"]
    assert obj.class_id == 3
    assert obj.search_mask.sum() > 100
    assert obj.validation_pts.shape == (512, 3)
    assert obj.hull_eqs.shape[1] == 4
    assert 0.1 < obj.diameter < 0.4
    assert int(np.asarray(obj.ppf_table.counts).sum()) > 1000
    # Cached reload produces identical assets.
    db2 = objectdb.load_object_db(
        YCB_CFG, MESHES, config=SMALL, cache_dir=str(tmp_path),
        only=["004_sugar_box"],
    )
    np.testing.assert_array_equal(db2["004_sugar_box"].search_pts, obj.search_pts)
    np.testing.assert_array_equal(
        np.asarray(db2["004_sugar_box"].ppf_table.pairs),
        np.asarray(obj.ppf_table.pairs),
    )


def test_mesh_scale_sane():
    # All 32 reference meshes load and are metrically plausible (< 0.5 m).
    import os

    from physimglobalpose_tpu.models import assets

    for name in sorted(os.listdir(MESHES))[:6]:
        mesh = assets.load_mesh(os.path.join(MESHES, name))
        ext = mesh.vertices.max(0) - mesh.vertices.min(0)
        assert (ext < 0.6).all() and (ext > 0.005).any(), name
