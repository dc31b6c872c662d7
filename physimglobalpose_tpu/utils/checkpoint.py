"""Checkpoint / resume for trainable components (FCN) and search state.

The reference has no computation checkpointing (SURVEY.md section 5): NN
weights are load-only, results are per-scene files. Here:
- FCN training state (params + opt state + step) saves/restores via orbax
  (standard JAX checkpointing; falls back to npz if orbax is unavailable);
- dataset sweeps resume via the JSONL log (pipeline/evaluate.py);
- MCTS snapshots serialize the best assignment + RNG seed per scene.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np


def save_train_state(path: str, params: Any, opt_state: Any, step: int) -> None:
    """Save a Flax/optax train state. Uses orbax when importable."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path),
            {"params": params, "opt_state": opt_state, "step": step},
            force=True,
        )
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    # npz fallback: flatten the pytree.
    import jax

    leaves, treedef = jax.tree.flatten({"params": params, "opt_state": opt_state})
    np.savez(
        path + ".npz",
        step=step,
        treedef=str(treedef),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_train_state(path: str, like_params: Any, like_opt_state: Any):
    """Restore (params, opt_state, step); `like_*` provide the pytree shape."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {"params": like_params, "opt_state": like_opt_state, "step": 0}
        restored = ckptr.restore(os.path.abspath(path), target)
        return restored["params"], restored["opt_state"], int(restored["step"])
    except Exception:
        pass
    import jax

    z = np.load(path + ".npz", allow_pickle=False)
    leaves_like, treedef = jax.tree.flatten(
        {"params": like_params, "opt_state": like_opt_state}
    )
    leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    restored = jax.tree.unflatten(treedef, leaves)
    return restored["params"], restored["opt_state"], int(z["step"])


def save_search_snapshot(path: str, scene_dir: str, assignment, best_cost: float, seed: int) -> None:
    """Persist an MCTS/greedy search outcome for a scene (resume/inspection)."""
    with open(path, "w") as fh:
        json.dump(
            {
                "scene": scene_dir,
                "assignment": [int(a) for a in assignment],
                "best_cost": float(best_cost),
                "seed": int(seed),
            },
            fh,
        )


def load_search_snapshot(path: str) -> Optional[dict]:
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)
