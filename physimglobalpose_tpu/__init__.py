"""physimglobalpose_tpu — TPU-native 6D pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
cmitash/PhysimGlobalPose (ICRA'18 "Improving 6D Pose Estimation of Objects in
Clutter via Physics-aware Monte Carlo Tree Search"): RGB-D preprocessing,
StoCS/Super4PCS congruent-set hypothesis generation, LCP scoring, batched ICP
refinement, depth rendering, physics-aware settle, and MCTS over object
placement orders — all designed for TPU (static shapes, batched kernels,
device meshes) rather than translated from the reference's C++/ROS pipeline.
"""

__version__ = "0.1.0"

# NOTE: this __init__ must stay jax-free - jax freezes JAX_PLATFORMS at
# import time, and entry points (cli.py --platform) set the environment
# first. Jax-using modules import physimglobalpose_tpu._jaxcfg themselves.

from physimglobalpose_tpu.config import (  # noqa: F401
    PipelineConfig,
    StoCSConfig,
    LCPConfig,
    ICPConfig,
    PhysicsConfig,
    RenderConfig,
    MCTSConfig,
    PreprocessConfig,
)
