"""Closed-loop accuracy test: synthesize a scene from known poses, run the
full pipeline, verify pose recovery in metric terms (ADD-S).

The bundled reference scene has no GT object poses in gt_info.yml, so this
is the accuracy-parity harness: ground truth is exact by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.config import PipelineConfig, PreprocessConfig, StoCSConfig
from physimglobalpose_tpu.geometry import metrics
from physimglobalpose_tpu.ops import ppf, raster
from physimglobalpose_tpu.pipeline import hypothesis, segmentation
from physimglobalpose_tpu.ops import icp as icp_mod

K_INTR = np.array([[400.0, 0, 120], [0, 400.0, 90], [0, 0, 1]], dtype=np.float32)
H, W = 180, 240

CFG = PipelineConfig(
    preprocess=PreprocessConfig(max_segment_points=512),
    stocs=StoCSConfig(num_bases=64, max_quads_per_base=32, max_pairs_per_ppf=128),
    max_model_points=512,
    max_validation_points=1024,
)


@pytest.fixture(scope="module")
def assets():
    from tests.test_stocs import box_model

    rng = np.random.default_rng(11)
    mpts, mnrm = box_model(rng, n=400, size=(0.10, 0.07, 0.05))
    table = ppf.build_ppf_table(mpts[:256], mnrm[:256])
    return mpts, mnrm, table


def test_full_pipeline_recovers_synthetic_pose(assets):
    mpts, mnrm, table = assets
    rot = Rotation.from_euler("xyz", [140, 30, -60], degrees=True).as_matrix().astype(np.float32)
    t = np.array([0.02, -0.03, 0.55], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = rot
    gt[:3, 3] = t

    # Render the observed depth with the framework's own rasterizer.
    depth = np.asarray(
        raster.render_object_depth(
            jnp.asarray(gt), jnp.asarray(mpts), jnp.ones(len(mpts), bool),
            jnp.asarray(K_INTR), H, W, radius=1,
        )
    )
    assert (depth > 0).sum() > 1500
    prob = (depth > 0).astype(np.float32)

    seg = segmentation.compute_3d_segment(
        jnp.asarray(depth), jnp.asarray(prob), jnp.asarray(K_INTR),
        jax.random.key(0), CFG,
    )
    assert int(seg.mask.sum()) > 50

    res = hypothesis.generate_hypotheses(
        jax.random.key(1), seg,
        jnp.asarray(mpts[:256]), jnp.ones(256, bool), table,
        jnp.asarray(mpts), jnp.asarray(mnrm),
        CFG, use_pallas=False,
    )
    assert float(res.best_score) > 0.1

    refined = icp_mod.refine_icp(
        res.best_transform[None], jnp.asarray(mpts[:256]), jnp.asarray(mnrm[:256]),
        seg.pts, seg.mask, iters=15,
    )[0]

    adds = float(
        metrics.adds_error(refined, jnp.asarray(gt), jnp.asarray(mpts[:512]))
    )
    assert adds < 0.01, f"ADD-S {adds:.4f} m"
    # Symmetry-folded rotation error for a box-symmetric object.
    rot_err, trans_err = metrics.pose_error(
        refined, jnp.asarray(gt), jnp.asarray([180.0, 180.0, 180.0])
    )
    assert float(trans_err) < 0.015
