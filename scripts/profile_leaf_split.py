"""Leaf-evaluator stage split on REAL assets: settle vs render vs cost.

The synthetic profile (profile_mcts.py) uses 8-vertex box hulls; real scenes
carry 64-vertex / 96-face asset hulls and 1024-point validation clouds, and
the whole-scene MCTS time is dominated by device compute against those
(ROUND3_NOTES). This script builds a BatchedLeafEvaluator from the bundled
reference scene's actual objects and times three jitted variants at the
production leaf batch:

  full    = settle -> render -> cost        (the production leaf program)
  settle  = settle only (costs = 0)
  render  = render+cost only (settle skipped, raw hypothesis poses)

full - settle ~= render share; full - render ~= settle share. Timings are
pipelined over 4 dispatches per fetch to subtract the ~31 ms axon round trip
(CLAUDE.md dispatch-amortization note).

Run: python scripts/profile_leaf_split.py [--platform cpu] [--batch 128]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import functools
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
parser.add_argument("--batch", type=int, default=128)
parser.add_argument("--steps", type=int, default=None, help="physics steps override")
args = parser.parse_args()
if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

import jax
import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.config import (
    MCTSConfig, PhysicsConfig, PipelineConfig, PreprocessConfig, StoCSConfig,
)
from physimglobalpose_tpu.geometry import se3
from physimglobalpose_tpu.models import objectdb
from physimglobalpose_tpu.ops import cost as cost_mod, raster
from physimglobalpose_tpu.pipeline import mcts, scene as scene_mod

SCENE = "/root/reference/test-scene"
MODELS = "/root/reference/src/physim_pose_estimation/models_visualization"
OBJ_CFG = "/root/reference/src/physim_pose_estimation/src/data_layer/obj_config.yml"


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w", "radius", "mode"))
def _eval_variant(consts, cfg, h, w, radius, choices, active, mode):
    def one(choice_row, active_row):
        if mode == "full":
            return mcts._leaf_eval_one(consts, cfg, h, w, radius, choice_row, active_row)
        k = consts["hull_pts"].shape[0]
        num_hyp = consts["hyp_world"].shape[1]
        safe_choice = jnp.clip(choice_row, 0, num_hyp - 1)
        poses_w = consts["hyp_world"][jnp.arange(k), safe_choice]
        if mode == "render":
            settled_cam = jnp.einsum("ij,kjl->kil", consts["cam_pose_inv"], poses_w)
            depth = raster.render_scene_depth(
                settled_cam, consts["render_pts"],
                consts["render_mask"] & active_row[:, None],
                consts["intr"], h, w, radius=radius,
                max_depth=cfg.render.max_render_depth,
            )
            c = cost_mod.render_cost(consts["obs"], depth, cfg.render.explanation_threshold)
            return c, poses_w
        # mode == "settle": reuse the production path by monkey-free copy:
        # run _leaf_eval_one's settle through the public solver directly.
        ph = cfg.physics
        from physimglobalpose_tpu.ops import physics

        order_pos = jnp.cumsum(active_row.astype(jnp.int32)) - 1
        quat = se3.matrix_to_quat(poses_w[:, :3, :3])
        pos = poses_w[:, :3, 3]

        def scene_for(inv_mass, placed_row):
            return physics.PhysicsScene(
                hull_pts=consts["hull_pts"],
                hull_mask=consts["hull_mask"] & placed_row[:, None],
                hull_eqs=consts["hull_eqs"],
                inv_mass=inv_mass,
                inv_inertia=consts["inv_inertia"],
                table_pose=consts["table_pose"],
                table_half_extents=jnp.asarray(ph.table_half_extents),
                body_active=placed_row,
            )

        def settle_step(carry, d):
            q, p = carry
            is_dyn = active_row & (order_pos == d)
            placed = active_row & (order_pos <= d)
            inv_mass = jnp.where(is_dyn, 1.0 / ph.object_mass, 0.0)
            dyn = jnp.where(jnp.any(is_dyn), jnp.argmax(is_dyn), -1)
            q2, p2 = physics.settle_single_dynamic(
                scene_for(inv_mass, placed), q, p, dyn,
                steps=ph.steps, substeps=ph.substeps, dt=ph.dt,
                gravity=ph.gravity, damping=ph.damping,
                friction=ph.friction, restitution=ph.restitution,
            )
            return (q2, p2), None

        (q2, p2), _ = jax.lax.scan(settle_step, (quat, pos), jnp.arange(k))
        settled_w = se3.pose_from_rot_trans(se3.quat_to_matrix(q2), p2)
        return jnp.zeros(()), settled_w

    return jax.vmap(one)(choices, active)


def main():
    print(f"backend {jax.default_backend()}")
    cfg = PipelineConfig(
        preprocess=PreprocessConfig(max_segment_points=512),
        stocs=StoCSConfig(num_bases=48, max_quads_per_base=32, max_pairs_per_ppf=128),
        max_model_points=512,
        max_validation_points=1024,
    )
    if args.steps:
        cfg = PipelineConfig(
            preprocess=cfg.preprocess, stocs=cfg.stocs,
            max_model_points=cfg.max_model_points,
            max_validation_points=cfg.max_validation_points,
            physics=PhysicsConfig(steps=args.steps),
        )
    db = objectdb.load_object_db(
        OBJ_CFG, MODELS, config=cfg, cache_dir="/tmp/ppf_cache"
    )
    sc = scene_mod.load_scene(SCENE, dataset="APC")
    k = len(sc.object_names)
    c = cfg.mcts.branching
    rng = np.random.default_rng(0)
    hyps = np.tile(np.eye(4, dtype=np.float32), (k, c, 1, 1))
    obj_hulls = []
    for i, name in enumerate(sc.object_names):
        obj = db[name]
        for j in range(c):
            hyps[i, j, :3, 3] = [
                0.85 + rng.normal(scale=0.01),
                -0.1 + 0.1 * i + rng.normal(scale=0.01),
                0.62 + rng.normal(scale=0.02),
            ]
        obj_hulls.append(dict(
            hull_pts=obj.hull_pts, hull_mask=obj.hull_mask,
            hull_eqs=obj.hull_eqs, render_pts=obj.validation_pts,
            render_mask=np.ones(len(obj.validation_pts), bool),
        ))
    print(f"k={k} hull_pts={obj_hulls[0]['hull_pts'].shape} "
          f"faces={obj_hulls[0]['hull_eqs'].shape} "
          f"render={obj_hulls[0]['render_pts'].shape} steps={cfg.physics.steps}")
    table_pose = np.eye(4, dtype=np.float32)
    table_pose[2, 3] = 0.53
    ev = mcts.BatchedLeafEvaluator(
        obj_hulls, hyps, np.asarray(sc.depth), sc.intrinsics, sc.cam_pose,
        table_pose, cfg,
    )
    b = args.batch
    choices = rng.integers(0, c, size=(b, k))
    active = np.ones((b, k), bool)
    cj, aj = jnp.asarray(choices), jnp.asarray(active)
    for mode in ("full", "settle", "render"):
        run = lambda: _eval_variant(
            ev.consts, cfg, ev.h, ev.w, ev.splat_radius, cj, aj, mode)
        out = run()
        np.asarray(out[1])  # compile + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(4)]  # pipeline 4 dispatches
            np.asarray(outs[-1][1])
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"{mode:7s}: {best * 1e3:8.1f} ms/dispatch "
              f"({best / b * 1e3:6.3f} ms/leaf)")


if __name__ == "__main__":
    main()
