"""Typed configuration for the whole pipeline.

The reference scatters its operating constants across hardcoded C++ literals
(see e.g. reference super4pcs_test.cc:20-37, match4pcsBase.cc:290-304,
UCTState.cpp:8-10, UCTSearch.cpp:10, PhySim.cpp:3). Here every knob lives in
one frozen dataclass tree so a run is fully described by a single config
value; defaults reproduce the reference's envelope.

All dataclasses are hashable (frozen) so they can be passed as static
arguments to jitted functions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Depth/scene preprocessing knobs.

    Mirrors: depth clip 0.1-2.0 m (utilities.cpp:144), scene voxel 5 mm
    (SceneCfg.cpp:47-52), plane inlier 5 mm (SceneCfg.cpp:57-80), segment
    voxel 1 cm + MLS radius 2 cm (Segmentation.cpp:234-246), outlier removal
    3 cm / 10 neighbors and the 30-point bail (ObjectPoseCandidateSet.cpp:28-51).
    """

    depth_min: float = 0.1
    depth_max: float = 2.0
    scene_voxel: float = 0.005
    plane_dist_threshold: float = 0.005
    plane_ransac_iters: int = 256
    segment_voxel: float = 0.01
    normal_k: int = 16  # k-NN PCA normals (replaces reference MLS normals)
    outlier_radius: float = 0.03
    outlier_min_neighbors: int = 10
    min_segment_points: int = 30
    max_segment_points: int = 1024  # static-shape cap for a 3D segment
    prob_scale: float = 10000.0  # 16-bit prob-image fixed-point scale
    background_prob: float = 0.8  # FCN threshold mode background gate


@dataclasses.dataclass(frozen=True)
class StoCSConfig:
    """Stochastic Congruent Sets hypothesis generation.

    Mirrors: 100 bases / <=100 quads per base (match4pcsBase.cc:290-291,1858),
    PPF discretization 5 mm / 10 deg (match4pcsBase.cc:303-304), delta 0.005
    (super4pcs_test.cc:20), base-sampling gates (match4pcsBase.cc:600-792):
    inner angle >= 30 deg for point 3, coplanarity 0.01, min spacing 0.01.
    """

    num_bases: int = 100
    max_quads_per_base: int = 100
    delta: float = 0.005
    distance_factor: float = 2.0  # pair/invariant match radius multiplier
    trans_disc_mm: int = 5
    rot_disc_deg: int = 10
    min_base_angle_deg: float = 30.0
    coplanarity_threshold: float = 0.01
    min_point_spacing: float = 0.01
    # Static-shape caps for the TPU formulation:
    max_pairs_per_ppf: int = 256  # pair-list cap per PPF bin (CSR row cap)
    max_ppf_dist_mm: int = 640  # distance-feature range cap (bin count driver)
    max_hypotheses: int = 4096  # global per-object hypothesis cap


@dataclasses.dataclass(frozen=True)
class LCPConfig:
    """Largest-common-pointset verification.

    Mirrors Verify/WeightedVerify (match4pcsBase.cc:1699-1766): inlier radius
    delta=0.005, weighted mode gates on <30 deg normal agreement and
    accumulates per-point segmentation probability.
    """

    delta: float = 0.005
    normal_gate_deg: float = 30.0


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Batched fixed-iteration ICP refinement.

    The reference refines via PCL TrimmedICP / point-to-plane
    (utilities.cpp:651-739) post-hoc; here ICP is a first-class batched stage.
    """

    iters: int = 20
    trim_fraction: float = 0.8  # keep this fraction of best correspondences
    max_corr_dist: float = 0.02
    point_to_plane: bool = True


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Depth rendering + pixel cost.

    Mirrors: 640x480 depth (camera.cpp:31), render clamp depth>1m to 0
    (renderScene.cpp:70), 1 cm explanation threshold (UCTState.cpp:8).
    """

    width: int = 640
    height: int = 480
    max_render_depth: float = 1.0
    explanation_threshold: float = 0.01


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    """Vectorized rigid-body settle.

    Mirrors Bullet usage (PhySim.cpp): gravity (0,0,-2), 60 steps at 1/60 s,
    damping 0.99, friction 1.0, restitution 0, dynamic mass 10, table
    half-extents (0.4, 0.4, 0.2).
    """

    gravity: float = -2.0
    # steps*dt = simulated settle duration. The reference simulates 1.0 s
    # (60 Bullet steps at 1/60, PhySim.cpp); 30 steps = 0.5 s halves the
    # sequential substep chain (the whole cost of the vmapped MCTS leaf
    # settle on TPU - each substep is one fused op bundle, so the chain
    # length IS the latency). Deviation chosen and measured (round 3): all
    # physics/stacked/decoy/clutter regressions and the 24/24 synthetic
    # multi-object MCTS sweep hold at 0.5 s; the solver step h=dt/substeps
    # stays 1/120 (coarsening h to 1/60 instead FAILED the clutter ranking
    # regression - duration, not step size, was the safe axis).
    steps: int = 30
    dt: float = 1.0 / 60.0
    # Position-based solver substeps per step. The sequential substep chain
    # (steps x substeps), not the per-substep FLOPs, is what the vmapped MCTS
    # leaf settle pays on TPU; 2 halves the r3 chain (240 -> 120) with the
    # per-substep penetration bound still ~5 mm at the <=0.6 m/s impact
    # speeds hypotheses reach. Gated by tests/test_physics.py,
    # test_mcts_stacked.py, test_mcts_accuracy.py and the golden-scene e2e
    # regression at this default.
    substeps: int = 2
    damping: float = 0.99
    friction: float = 1.0
    restitution: float = 0.0
    object_mass: float = 10.0
    table_half_extents: Tuple[float, float, float] = (0.40, 0.40, 0.20)
    contact_slop: float = 0.001


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """UCT search over object placement orders.

    Mirrors UCTSearch/UCTState: exploration alpha=5000 with a *minimizing*
    UCB (UCTState.cpp:10,275-296), budget 60 s or sum_i 25^i expansions
    (UCTSearch.cpp:10,286-307), branching cap 25 hypotheses per object.
    The reference's trimmed-ICP point-removal step (UCTState::performTrICP,
    UCTState.cpp:121-204) is commented out of its own MCTS loop
    (UCTSearch.cpp:98,157,225) but LIVE in the greedy BFS (Search.cpp:45);
    here it is revived as a final-state refinement (tricp_* knobs below).
    """

    alpha: float = 5000.0
    max_search_seconds: float = 60.0
    branching: int = 25
    # Leaf-render downscale factor: the leaf evaluator renders at
    # (height/render_scale, width/render_scale). The reference renders full
    # 640x480 meshes per node (UCTState.cpp:23,93-116); scale 4 (160x120) is
    # the measured default: the stacked + decoy regressions run at scale 1
    # (tests/test_mcts_stacked.py, tests/test_mcts.py) and the clutter ADD-S
    # regression at the scale-4 default (tests/test_mcts_accuracy.py) - both
    # scales recover the correct assignments (ROUND3_NOTES.md item 4).
    render_scale: int = 4
    # Search-time contact-hull budget: the leaf evaluator re-decimates each
    # object's convex hull to at most this many vertices (farthest-point
    # sampled subset, faces recomputed - an inscribed approximation of the
    # full hull, with faces shifted outward to circumscribe). Contact math
    # per settle substep scales with vertices x faces, and the full
    # 64-vertex/96-face hulls are the residual MCTS leaf cost on real
    # scenes (ROUND3_NOTES.md). The decimated hulls drive ONLY the search
    # ranking; the chosen assignment is re-settled with the FULL hulls
    # (evaluate_final), so reported poses carry no hull approximation.
    # STILL ships disabled (0): measured round 3, crude hulls degrade the
    # RANKING itself for cylindrical objects - the clutter regression's can
    # flips to a 12.5 cm decoy at 24 search-hull vertices even with the
    # full-hull final settle. Opt-in latency lever for boxy object sets.
    contact_hull_vertices: int = 0
    # Splat footprint radius for the leaf render. -1 = auto: radius 1 at
    # full resolution (render_scale 1, where 4096 points leave holes), 0 at
    # reduced scales (the cloud is dense there and each extra tap is another
    # sequential scatter pass - measured 2.08 -> 1.57 ms/leaf at scale 4,
    # scripts/profile_mcts.py; ranking regressions gated by
    # test_mcts_accuracy at the scale-4 default).
    leaf_splat_radius: int = -1
    # Settle rollout placements sequentially (object i dynamic on top of
    # 0..i-1 at their *settled* poses, lax.scan over placement order),
    # matching the reference's per-step correctPhysics
    # (UCTSearch.cpp:140-194, UCTState.cpp:208-270). False = single settle
    # of the complete assignment with only the last object dynamic (faster,
    # k x less physics; equivalent only for non-stacked scenes).
    sequential_settle: bool = True
    # Leaves evaluated per device dispatch. Measured on v5e (round 3,
    # scripts/profile_mcts.py, sequential settle): 3.04 ms/leaf at 64,
    # 2.22 at 128, 2.08 at 256 - 128 takes most of the amortization while
    # the tree still gets feedback every ~128 leaves (virtual loss
    # decorrelates within a batch; search results unchanged on the decoy
    # and stacked regressions).
    leaf_batch: int = 128
    # Leaves per dispatch for the MULTI-scene search (uct_search_multi):
    # the batch is split across the live trees, so an 8-scene sweep at the
    # single-scene 128 would give each tree only 16 leaves per round and
    # pay ~4x the dispatch rounds. 512 measured best on v5e
    # (scripts/r3_mcts_sweep_batch.py, 8-scene sweep: 128 -> 970 ms/scene,
    # 512 -> 759, 1024 -> 812); per-tree virtual-loss exposure stays at or
    # under the single-scene search's own 128 leaves/round whenever >= 4
    # scenes are live.
    leaf_batch_multi: int = 512
    # Dispatched-but-not-backed-up leaf batches the search keeps in flight.
    # At depth 1 every round serializes host backup + tree policy + the
    # axon tunnel's dispatch/fetch round trip BEHIND the device program
    # (measured ~41 ms/round wall vs ~26 ms device compute,
    # scripts/r3_mcts_phase_probe.py); depth 2 overlaps the fetch latency
    # of batch i with the device executing batch i+1. Virtual loss already
    # decorrelates outstanding descents, so depth D exposes the tree to at
    # most D*leaf_batch uncommitted leaves (the same exposure class the
    # batch itself creates; accuracy gates: decoy, stacked, clutter ADD-S,
    # synthetic 24-instance sweep).
    inflight_batches: int = 2
    # Final-state trimmed ICP (UCTState::performTrICP revived, VERDICT r4
    # #2): after the search picks an assignment, each placed object is
    # refined against its segment MINUS points within tricp_removal_radius
    # of already-placed objects' model clouds (UCTState.cpp:158-175), in
    # placement order, as trimmed point-to-point ICP (PCL TrimmedICP
    # semantics, trim fraction of SEGMENT correspondences kept). Three
    # candidate final states are evaluated in ONE device program - raw
    # settle, TrICP->settle (the reference expandNode order, Search.cpp:45),
    # and settle->TrICP polish - and the min-render-cost one is installed,
    # so the refinement can only improve the explained-pixel objective.
    tricp_final: bool = True
    # Trim = fraction of SEGMENT correspondences kept (PCL TrimmedICP trims
    # the source cloud = the observed segment; the model is complete, so
    # occlusion does NOT create segment outliers - only noise/bleed does).
    # 0.9 is the reference's LIVE value (greedy Search.cpp:6); its
    # commented-out MCTS constant 0.5 measurably stalls convergence
    # (tests/test_mcts_tricp.py probe: 1.5 cm + 8 deg perturbation recovers
    # to 0.0 mm at trim 0.9 vs 9-10 mm at 0.5).
    tricp_trim: float = 0.9
    tricp_removal_radius: float = 0.008  # UCTState.cpp:9 pointRemovalThreshold
    tricp_iters: int = 12
    # PCL TrimmedICP has no correspondence gate (the trim is the gate); this
    # cap just bounds the basin so a fully-wrong pose cannot latch onto a
    # neighbor - generous vs the <=2.4 cm misses it exists to fix.
    tricp_max_corr_dist: float = 0.06
    # Final render-cost polish (beyond-reference, opt-in): after the TrICP
    # candidate vote, descend the PIXEL cost itself - batched
    # random-perturbation rounds around the chosen final state, keep the
    # best row, shrink sigma. Ships DISABLED (0): on the hard family it
    # descends reliably in cost but the cost minimum is not GT inside the
    # sensor-noise floor - measured (HARD_MISS_ANALYSIS.json) the >2 cm
    # misses are occlusion-unobservable (GT-substituted poses cost the SAME
    # or MORE than the reported ones even at full render resolution), so the
    # polish trades mm-level noise (hard MCTS mean ADD-S 7.05 -> 7.42 mm).
    # It remains the right tool when the cost DOES discriminate (e.g. a
    # custom scorer or fused multi-view observations).
    final_polish_rounds: int = 0
    final_polish_batch: int = 192
    final_polish_sigma_t: float = 0.01  # meters, halves per round
    final_polish_sigma_r_deg: float = 4.0  # degrees, halves per round
    # Polish render scale (1 = full resolution, where the measured
    # cost-visible miss margins live - 7-22 px at scale 1 vs 0-12 at the
    # search's scale 4); per_object concentrates each round's samples on one
    # object at a time (K x the dispatches, far better sample efficiency
    # for single-object misses).
    final_polish_scale: int = 1
    final_polish_per_object: bool = True
    # Hard cap on expansions. Deviation from the reference's sum_i 25^i
    # stopping criterion (UCTSearch.cpp:290-294), which for k>=3 objects is
    # never the binding constraint anyway: its 60 s wall clock cuts first,
    # and at >=100 ms per serial expansion (60 Bullet steps + a GL render
    # round trip) that is <= ~600 expansions per scene. 1200 keeps 2x the
    # reference's effective search coverage; every accuracy regression
    # (decoy, stacked, multi-object clutter ADD-S) holds with far less.
    max_expansions: int = 1200


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level pipeline configuration."""

    preprocess: PreprocessConfig = PreprocessConfig()
    stocs: StoCSConfig = StoCSConfig()
    lcp: LCPConfig = LCPConfig()
    icp: ICPConfig = ICPConfig()
    render: RenderConfig = RenderConfig()
    physics: PhysicsConfig = PhysicsConfig()
    mcts: MCTSConfig = MCTSConfig()
    # Model asset caps (static shapes).
    max_model_points: int = 1024  # sampled model cloud (matching)
    max_validation_points: int = 4096  # dense model cloud (LCP / render)
    max_hull_points: int = 64  # convex hull vertices (physics / pose dist)


DEFAULT_CONFIG = PipelineConfig()
