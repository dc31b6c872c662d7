"""Reference-vs-framework parity gate over REF_PARITY.json (VERDICT r3 #1).

REF_PARITY.json is produced by scripts/ref_parity.py: it runs the ACTUAL
reference StoCS engine (compiled path-patched from
/root/reference/src/3rdparty/super4pcs by scripts/ref_oracle/build.sh) and
this framework on IDENTICAL inputs for the bundled test scene, recording both
systems' best poses and LCP scores. This test re-derives the gates from the
recorded poses/scores — it does NOT trust the artifact's own pass flags:

1. best-pose agreement: the framework's best pose per object is within
   symmetry-folded 10 deg / 2 cm of the reference's (or scores at least as
   high under the one common scorer, since StoCS is stochastic);
2. LCP cross-check: the framework's weighted-LCP of the ORACLE's pose
   reproduces the oracle's own kd-tree WeightedVerify score
   (match4pcsBase.cc:1733-1766) to 0.05.

The pose error is recomputed here from the recorded 4x4s with the framework's
metrics.pose_error and symmetries parsed straight from the reference's
obj_config.yml, so a metrics regression also trips this gate.
"""

import json
import os

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from physimglobalpose_tpu.geometry import metrics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY = os.path.join(REPO, "REF_PARITY.json")
PARITY_SYNTH = os.path.join(REPO, "REF_PARITY_SYNTH.json")
OBJ_CFG = (
    "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"
)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PARITY) and os.path.exists(OBJ_CFG)),
    reason="REF_PARITY.json or reference obj_config.yml not present",
)


def _symmetries():
    with open(OBJ_CFG) as fh:
        cfg = yaml.safe_load(fh)["objects"]
    out = {}
    for i in range(1, int(cfg["num_objects"]) + 1):
        e = cfg[f"object_{i}"]
        out[e["name"]] = np.asarray(e.get("symmetry", [0, 0, 0]), np.float32)
    return out


def _report(path=PARITY):
    with open(path) as fh:
        return json.load(fh)


def test_every_scene_object_present():
    rep = _report()
    assert set(rep["objects"]) == {
        "kleenex_tissue_box",
        "expo_dry_erase_board_eraser",
        "folgers_classic_roast_coffee",
    }
    # The artifact must come from >= 2 oracle runs per object (stochastic
    # engine; one run proves little).
    for obj in rep["objects"].values():
        assert len(obj["oracle"]["runs"]) >= 2


def test_lcp_cross_check_against_reference_scorer():
    """Framework weighted-LCP of the oracle pose == oracle's own LCP (0.05)."""
    rep = _report()
    for name, obj in rep["objects"].items():
        cross = obj["lcp_cross_check"]
        diff = abs(
            cross["framework_lcp_of_oracle_pose"] - cross["oracle_reported_lcp"]
        )
        assert diff <= 0.05, f"{name}: LCP cross-check diff {diff:.4f} > 0.05"


def test_best_pose_agreement_recomputed():
    """Recompute folded rot/trans error between the recorded best poses."""
    rep = _report()
    syms = _symmetries()
    for name, obj in rep["objects"].items():
        fw_pose = np.asarray(obj["framework"]["best_pose"], np.float32)
        or_pose = np.asarray(obj["oracle"]["best_pose"], np.float32)
        rot_err, trans_err = metrics.pose_error(
            jnp.asarray(fw_pose), jnp.asarray(or_pose), jnp.asarray(syms[name])
        )
        rot_err, trans_err = float(rot_err), float(trans_err)
        pose_close = rot_err <= 10.0 and trans_err <= 0.02
        score_wins = (
            obj["agreement"]["framework_lcp_of_own_pose"]
            >= obj["lcp_cross_check"]["framework_lcp_of_oracle_pose"] - 0.01
        )
        assert pose_close or score_wins, (
            f"{name}: framework best pose {rot_err:.1f} deg / "
            f"{trans_err * 1000:.1f} mm from the reference's, and does not "
            f"score competitively"
        )


# ---------------------------------------------------------------------------
# REF_PARITY_SYNTH.json: the OTHER direction of the parity loop. The scene is
# rendered by THIS framework's triangle rasterizer + APC codec
# (scripts/make_synthetic_scenes.py), then solved by the ACTUAL reference
# engine. The reference recovering the rendered GT validates the
# renderer/codec/intrinsics conventions behind every SYNTH_EVAL accuracy
# number against the real C++ — a shared convention bias (flipped intrinsics,
# codec misread, mirrored raster) would make the oracle miss the GT here.
# ---------------------------------------------------------------------------

synth_skip = pytest.mark.skipif(
    not os.path.exists(PARITY_SYNTH), reason="REF_PARITY_SYNTH.json not present"
)


@synth_skip
def test_synth_oracle_recovers_framework_rendered_gt():
    """The reference engine solves the framework-rendered scene to its GT."""
    rep = _report(PARITY_SYNTH)
    assert rep["objects"], "synthetic parity artifact has no objects"
    for name, obj in rep["objects"].items():
        gt = obj["vs_rendered_gt"]["oracle_vs_gt"]
        assert gt["rot_deg"] <= 10.0 and gt["trans_m"] <= 0.02, (
            f"{name}: reference oracle pose is {gt['rot_deg']:.1f} deg / "
            f"{gt['trans_m'] * 1000:.1f} mm from the framework-rendered GT — "
            f"rendering-convention mismatch"
        )


@synth_skip
def test_synth_lcp_cross_check_and_agreement():
    """Same two gates as the bundled scene, on the synthetic scene."""
    rep = _report(PARITY_SYNTH)
    for name, obj in rep["objects"].items():
        cross = obj["lcp_cross_check"]
        diff = abs(
            cross["framework_lcp_of_oracle_pose"] - cross["oracle_reported_lcp"]
        )
        assert diff <= 0.05, f"{name}: LCP cross-check diff {diff:.4f} > 0.05"
        ag = obj["agreement"]
        pose_close = (
            ag["rot_err_deg_folded"] <= 10.0 and ag["trans_err_m"] <= 0.02
        )
        score_wins = (
            ag["framework_lcp_of_own_pose"]
            >= cross["framework_lcp_of_oracle_pose"] - 0.01
        )
        assert pose_close or score_wins, f"{name}: synthetic parity fails"


# ---------------------------------------------------------------------------
# REF_PARITY_HARD.json: parity ON THE HARD FAMILY - a framework-rendered
# scene from the occlusion/contact/noise/distractor generator
# (make_synthetic_scenes.py --hard, max occlusion ~0.74). The agreement and
# LCP-cross-check gates are the same as the easy scenes: even where
# per-object best-LCP selection is known to degrade (SYNTH_EVAL "hard": LCP
# 79% within 2 cm), the two implementations of THAT ALGORITHM must still
# agree with each other. No oracle-vs-GT gate here by design - under >70%
# occlusion the reference algorithm itself may miss the GT; what must hold
# is that both systems miss (or hit) IDENTICALLY enough to score within the
# common-scorer margin.
# ---------------------------------------------------------------------------

PARITY_HARD = os.path.join(REPO, "REF_PARITY_HARD.json")


def test_hard_scene_lcp_cross_check_and_agreement():
    """Both parity gates hold on the heavy-occlusion hard-family scene.

    Deliberately NOT skippable on a missing artifact: whenever the easy-scene
    parity artifact is present (module-level mark), the hard one must be too —
    a gate whose artifact is optional is not a gate (VERDICT r4 Weak #1).
    Regenerate with:
      python scripts/make_synthetic_scenes.py --out /tmp/rp_hard --n 2 --hard \
        --objects kleenex_tissue_box,expo_dry_erase_board_eraser,folgers_classic_roast_coffee \
        --seed 11
      python scripts/ref_parity.py --scene /tmp/rp_hard/scene_0000 \
        --out REF_PARITY_HARD.json --runs 3 --fw-runs 3
    """
    assert os.path.exists(PARITY_HARD), (
        "REF_PARITY_HARD.json missing while REF_PARITY.json exists - the "
        "hard-family parity gate is unarmed; regenerate per the docstring"
    )
    rep = _report(PARITY_HARD)
    assert len(rep["objects"]) == 3
    syms = _symmetries()
    for name, obj in rep["objects"].items():
        cross = obj["lcp_cross_check"]
        diff = abs(
            cross["framework_lcp_of_oracle_pose"] - cross["oracle_reported_lcp"]
        )
        assert diff <= 0.05, (
            f"{name}: hard-scene LCP cross-check diff {diff:.4f} > 0.05"
        )
        # Recompute the folded pose error from the recorded 4x4s (do not
        # trust the artifact's own pass flags).
        fw_pose = np.asarray(obj["framework"]["best_pose"], np.float32)
        or_pose = np.asarray(obj["oracle"]["best_pose"], np.float32)
        rot_err, trans_err = metrics.pose_error(
            jnp.asarray(fw_pose), jnp.asarray(or_pose), jnp.asarray(syms[name])
        )
        pose_close = float(rot_err) <= 10.0 and float(trans_err) <= 0.02
        score_wins = (
            obj["agreement"]["framework_lcp_of_own_pose"]
            >= cross["framework_lcp_of_oracle_pose"] - 0.01
        )
        assert pose_close or score_wins, (
            f"{name}: hard-scene disagreement - {float(rot_err):.1f} deg / "
            f"{float(trans_err) * 1000:.1f} mm from the oracle pose and not "
            f"score-competitive"
        )
