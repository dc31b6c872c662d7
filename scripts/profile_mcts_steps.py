"""MCTS leaf-evaluator cost split: dispatch latency vs settle/render compute.

Drives the whole-scene-MCTS <5 s target (VERDICT r2 Next #2b): measures one
BatchedLeafEvaluator dispatch at several batch sizes, with sequential vs
single-dynamic settle, on a synthetic 3-object box scene (no asset loading).
The per-dispatch time extrapolates to a search budget: total ~= dispatches x
(latency + compute(batch)).

Run on TPU (default) or --platform cpu.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import dataclasses
import time

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
args = parser.parse_args()
if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

import jax
import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.config import (
    MCTSConfig, PhysicsConfig, PipelineConfig, RenderConfig,
)
from physimglobalpose_tpu.ops import raster
from physimglobalpose_tpu.pipeline import mcts

K_INTR = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], dtype=np.float32)
H, W = 480, 640


def box_object(size, n_render=4096, seed=0):
    rng = np.random.default_rng(seed)
    s = size / 2
    faces = rng.integers(0, 6, n_render)
    u, v = rng.uniform(-0.5, 0.5, (2, n_render))
    pts = np.zeros((n_render, 3), np.float32)
    for i, f in enumerate(faces):
        ax, sign = f // 2, 1 if f % 2 == 0 else -1
        dims = [d for d in range(3) if d != ax]
        pts[i, ax] = sign * s
        pts[i, dims[0]] = u[i] * size
        pts[i, dims[1]] = v[i] * size
    eqs = np.array(
        [[1, 0, 0, -s], [-1, 0, 0, -s], [0, 1, 0, -s],
         [0, -1, 0, -s], [0, 0, 1, -s], [0, 0, -1, -s]], np.float32,
    )
    hull_eqs = np.tile(np.array([0, 0, 1, -1e9], np.float32), (8, 1))
    hull_eqs[:6] = eqs
    return dict(
        hull_pts=np.array(
            [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
            np.float32,
        ),
        hull_mask=np.ones(8, bool),
        hull_eqs=hull_eqs,
        render_pts=pts,
        render_mask=np.ones(n_render, bool),
    )


def main():
    print(f"backend {jax.default_backend()}")
    k, c = 3, 8
    objs = [box_object(0.06 + 0.01 * i, seed=i) for i in range(k)]
    rng = np.random.default_rng(0)
    table_pose = np.eye(4, dtype=np.float32)
    table_pose[2, 3] = 0.66
    cam_pose = np.eye(4, dtype=np.float32)
    hyps = np.tile(np.eye(4, dtype=np.float32), (k, c, 1, 1))
    for i in range(k):
        for j in range(c):
            hyps[i, j, :3, 3] = [
                -0.15 + 0.15 * i + rng.normal(scale=0.01),
                rng.normal(scale=0.02), 0.9 + rng.normal(scale=0.02),
            ]
    obs = np.zeros((H, W), np.float32)
    for i in range(k):
        d = np.asarray(
            raster.render_object_depth(
                jnp.asarray(hyps[i, 0]), jnp.asarray(objs[i]["render_pts"]),
                jnp.asarray(objs[i]["render_mask"]), jnp.asarray(K_INTR), H, W,
                radius=1,
            )
        )
        obs = np.asarray(raster.composite_min(jnp.asarray(obs), jnp.asarray(d)))

    for seq, steps in ((True, 60), (True, 6)):
        cfg = PipelineConfig(
            render=RenderConfig(width=W, height=H),
            physics=PhysicsConfig(steps=steps),
            mcts=MCTSConfig(sequential_settle=seq),
        )
        ev = mcts.BatchedLeafEvaluator(
            objs, hyps, obs, K_INTR, cam_pose, table_pose, cfg
        )
        print(f"--- sequential={seq} physics_steps={steps}")
        for b in (128,):
            choices = rng.integers(0, c, size=(b, k))
            active = np.ones((b, k), bool)
            ev.evaluate(choices, active)  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                costs, settled = ev.evaluate(choices, active)
                float(costs[0])
                best = min(best, time.perf_counter() - t0)
            print(f"seq={seq} steps={steps} batch={b:4d}: {best * 1e3:8.1f} ms "
                  f"({best / b * 1e3:6.2f} ms/leaf)")


if __name__ == "__main__":
    main()
