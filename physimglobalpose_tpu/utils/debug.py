"""Debug artifact dumps.

The reference persists every intermediate per scene: segment/model PLYs and
prob images into debug_super4PCS/, per-state depth renders and search traces
into debug_search/ (SURVEY.md section 5). Here the equivalents are npz/PNG
artifacts written under a debug directory when enabled - inspectable without
PCL: per-object segment clouds + probabilities, probability images, the
cleaned depth, and final pose overlays.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

from physimglobalpose_tpu.geometry import depthio
from physimglobalpose_tpu.utils import viz


class DebugDump:
    def __init__(self, root: Optional[str]):
        self.root = root
        if root:
            os.makedirs(root, exist_ok=True)

    @property
    def enabled(self) -> bool:
        return self.root is not None

    def depth(self, name: str, depth: np.ndarray) -> None:
        if self.enabled:
            depthio.write_depth_png(os.path.join(self.root, f"{name}.png"), np.asarray(depth))
            viz.save_depth_image(
                os.path.join(self.root, f"{name}_viz.png"), np.asarray(depth)
            )

    def prob_image(self, name: str, prob: np.ndarray) -> None:
        if self.enabled:
            depthio.write_prob_png(
                os.path.join(self.root, f"{name}_prob.png"), np.asarray(prob)
            )

    def segment(self, name: str, pts, nrm, prob, mask) -> None:
        if self.enabled:
            np.savez(
                os.path.join(self.root, f"{name}_segment.npz"),
                pts=np.asarray(pts), nrm=np.asarray(nrm),
                prob=np.asarray(prob), mask=np.asarray(mask),
            )

    def hypotheses(self, name: str, transforms, scores) -> None:
        if self.enabled:
            np.savez(
                os.path.join(self.root, f"{name}_hypotheses.npz"),
                transforms=np.asarray(transforms), scores=np.asarray(scores),
            )

    def overlay(
        self, name: str, color, intrinsics, model_clouds: Sequence, poses_cam: Sequence
    ) -> None:
        if self.enabled:
            viz.save_overlay(
                os.path.join(self.root, f"{name}.png"),
                np.asarray(color), np.asarray(intrinsics),
                [np.asarray(c) for c in model_clouds],
                [np.asarray(p) for p in poses_cam],
            )

    def info(self, name: str, payload: Dict) -> None:
        if self.enabled:
            with open(os.path.join(self.root, f"{name}.json"), "w") as fh:
                json.dump(payload, fh, indent=2, default=float)
