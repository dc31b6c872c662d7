"""Vectorized rigid-body settle: the TPU replacement for Bullet.

Reference (PhySim.cpp): a btDiscreteDynamicsWorld with gravity (0,0,-2), a
static table box (half extents 0.4x0.4x0.2), convex-hull collision shapes,
damping 0.99, friction 1.0, restitution 0; each MCTS node places previously
decided objects as static (mass 0), the new object dynamic (mass 10), steps
60x at 1/60 s and reads back the settled pose (UCTState::correctPhysics).

TPU design: position-based dynamics (PBD). Contacts are convex vertex-face:
object hull vertices against the table's top face and against other objects'
hull half-space planes — all contact candidates evaluated densely with masks
(fixed shapes), no broadphase. Known limitation of vertex-face-only contact:
two convex shapes with *exactly coincident* lateral boundaries (equal boxes
perfectly stacked) report zero depth because the penetrating vertices lie on
the other hull's side faces; real object hulls have distinct footprints, and
penetration must stay below the lateral clearance per substep (bounded here
by dt * fall speed, ~5 mm). The whole settle is one lax.fori_loop, vmapped
over a batch of scenes/hypotheses: thousands of 60-step settles run in one
device launch vs one serial Bullet world in the reference.

State layout (per scene): K bodies x (quat wxyz [4], pos [3], linvel [3],
angvel [3]). Static bodies have inv_mass 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax
import jax.numpy as jnp

from physimglobalpose_tpu.geometry import se3


class PhysicsScene(NamedTuple):
    """Static (per-batch-constant) physics inputs for K bodies."""

    hull_pts: jnp.ndarray  # [K, P, 3] object-local hull vertices
    hull_mask: jnp.ndarray  # [K, P]
    hull_eqs: jnp.ndarray  # [K, F, 4] object-local hull face planes
    inv_mass: jnp.ndarray  # [K] 0 for static
    inv_inertia: jnp.ndarray  # [K, 3] diagonal body-frame inverse inertia
    table_pose: jnp.ndarray  # [4, 4] world
    table_half_extents: jnp.ndarray  # [3]
    # [K] bool, or None = all active. An inactive body is absent from the
    # world entirely: no contacts in either role (its hull_eqs would
    # otherwise act as an invisible static collider for other bodies, which
    # is wrong for partial placements - the reference's correctPhysics only
    # adds placed objects to the Bullet world, UCTState.cpp:208-270).
    body_active: jnp.ndarray | None = None


def box_inv_inertia(hull_pts: jnp.ndarray, hull_mask: jnp.ndarray, mass: float) -> jnp.ndarray:
    """Diagonal inverse inertia of the hull's AABB as a solid box."""
    big = 1e9
    lo = jnp.min(jnp.where(hull_mask[:, None], hull_pts, big), axis=0)
    hi = jnp.max(jnp.where(hull_mask[:, None], hull_pts, -big), axis=0)
    ext = jnp.maximum(hi - lo, 1e-3)
    ixx = mass / 12.0 * (ext[1] ** 2 + ext[2] ** 2)
    iyy = mass / 12.0 * (ext[0] ** 2 + ext[2] ** 2)
    izz = mass / 12.0 * (ext[0] ** 2 + ext[1] ** 2)
    return 1.0 / jnp.stack([ixx, iyy, izz])


def _quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def _integrate_quat(q, omega, dt):
    """q' = q + dt/2 * (0, omega) * q, renormalized."""
    oq = jnp.concatenate([jnp.zeros_like(omega[..., :1]), omega], axis=-1)
    dq = 0.5 * dt * _quat_mul(oq, q)
    q2 = q + dq
    return q2 / jnp.maximum(jnp.linalg.norm(q2, axis=-1, keepdims=True), 1e-12)


def _contact_deltas(
    pos, quat, linvel, angvel, inv_mass, inv_inertia, r, n, depth, active,
    friction=1.0, restitution=0.0,
):
    """State deltas for one positional contact at world point pos+r, normal n.

    Material model (PhySim.cpp:53-79 semantics): restitution e reflects the
    inward normal velocity to -e*vn (e=0 kills it); friction mu removes
    min(1, 0.8*mu) of the tangential contact-point velocity per solve (mu=1
    reproduces the settle behavior validated against the reference's Bullet
    envelope; mu=0 is frictionless). Returned as additive deltas
    (dpos, drot_vec, dlinvel, dangvel) so multiple simultaneous contacts of
    one body can be Jacobi-summed (ops/physics.py substep design note).
    """
    rot = se3.quat_to_matrix(quat)  # [3,3]
    inv_i_world = rot @ jnp.diag(inv_inertia) @ rot.T
    rxn = jnp.cross(r, n)
    w = inv_mass + rxn @ inv_i_world @ rxn
    lam = jnp.where(active & (w > 0), depth / jnp.maximum(w, 1e-9), 0.0)
    p = lam * n
    dpos = p * inv_mass
    drot = inv_i_world @ jnp.cross(r, p)
    v_pt = linvel + jnp.cross(angvel, r)
    vn = jnp.dot(v_pt, n)
    v_norm_fix = jnp.where(active & (vn < 0), -(1.0 + restitution) * vn, 0.0) * n
    v_tan = v_pt - jnp.dot(v_pt, n) * n
    tan_coeff = jnp.clip(0.8 * friction, 0.0, 1.0)
    v_tan_fix = jnp.where(active, -tan_coeff * v_tan, jnp.zeros(3))
    dv = v_norm_fix + v_tan_fix
    # The 0.5 under-relaxes the angular velocity correction; full-strength
    # coupling makes single-point contact patches ring (solver stabilization
    # constant, not a material parameter).
    dangvel = inv_i_world @ jnp.cross(r, dv) * 0.5
    use = active & (inv_mass > 0)
    zero = jnp.zeros(3)
    return (
        jnp.where(use, dpos, zero),
        jnp.where(use, drot, zero),
        jnp.where(use, dv, zero),
        jnp.where(use, dangvel, zero),
    )


def _apply_contact(
    pos, quat, linvel, angvel, inv_mass, inv_inertia, r, n, depth, active,
    friction=1.0, restitution=0.0,
):
    """Positional contact resolution: apply one contact's deltas.

    Pushes the body along n by depth (single-body vs static other side);
    returns updated (pos, quat, linvel, angvel). See _contact_deltas for the
    material model.
    """
    dpos, drot, dlin, dang = _contact_deltas(
        pos, quat, linvel, angvel, inv_mass, inv_inertia, r, n, depth, active,
        friction=friction, restitution=restitution,
    )
    use = active & (inv_mass > 0)
    new_quat = _integrate_quat(quat, drot, 1.0)
    return (
        pos + dpos,
        jnp.where(use, new_quat, quat),
        linvel + dlin,
        angvel + dang,
    )


@functools.partial(
    jax.jit,
    static_argnames=("steps", "substeps", "dt", "gravity", "damping", "friction", "restitution"),
)
def settle(
    scene: PhysicsScene,
    init_quat: jnp.ndarray,  # [K, 4] world
    init_pos: jnp.ndarray,  # [K, 3] world
    steps: int = 60,
    substeps: int = 2,
    dt: float = 1.0 / 60.0,
    gravity: float = -2.0,
    damping: float = 0.99,
    friction: float = 1.0,
    restitution: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Settle K bodies; returns (quat [K, 4], pos [K, 3])."""
    k, p_max = scene.hull_pts.shape[:2]
    g = jnp.array([0.0, 0.0, gravity])
    h = dt / substeps

    t_inv = se3.invert_pose(scene.table_pose)
    top = scene.table_half_extents[2]
    foot = scene.table_half_extents[:2]

    def table_contact(quat_i, pos_i, hull_i, mask_i):
        """Contact-patch contact with the table top face.

        The lever arm is the penetration-weighted centroid of all penetrating
        hull vertices (a one-point stand-in for Bullet's contact manifold):
        a flat face resting on the table produces zero net torque instead of
        the tumbling kick a single deepest-vertex contact would give.
        """
        rot = se3.quat_to_matrix(quat_i)
        world = hull_i @ rot.T + pos_i  # [P, 3]
        local = world @ t_inv[:3, :3].T + t_inv[:3, 3]
        in_foot = (jnp.abs(local[:, 0]) <= foot[0]) & (jnp.abs(local[:, 1]) <= foot[1])
        depth = top - local[:, 2]  # >0 below the top surface
        pen = jnp.where(mask_i & in_foot & (depth > 0) & (depth < 2 * top), depth, 0.0)
        wsum = jnp.sum(pen)
        centroid = jnp.sum(world * pen[:, None], axis=0) / jnp.maximum(wsum, 1e-12)
        n_world = scene.table_pose[:3, :3] @ jnp.array([0.0, 0.0, 1.0])
        r = centroid - pos_i
        max_pen = jnp.max(pen)
        return r, n_world, max_pen, max_pen > 0

    def body_body_contact(quat_a, pos_a, hull_a, mask_a, quat_b, pos_b, eqs_b):
        """Contact-patch contact of a's vertices against b's hull faces.

        Normal from the deepest vertex's closest face; lever arm from the
        penetration-weighted centroid of all penetrating vertices (see
        table_contact for why).
        """
        rot_a = se3.quat_to_matrix(quat_a)
        world_a = hull_a @ rot_a.T + pos_a  # [P, 3]
        rot_b = se3.quat_to_matrix(quat_b)
        local = (world_a - pos_b) @ rot_b  # into b's frame
        sd = local @ eqs_b[:, :3].T + eqs_b[:, 3][None, :]  # [P, F] signed dist
        inside_depth = -jnp.max(sd, axis=1)  # >0 when inside hull b
        face = jnp.argmax(sd, axis=1)  # closest face per point
        pen = jnp.where(mask_a & (inside_depth > 0), inside_depth, 0.0)
        best = jnp.argmax(pen)
        wsum = jnp.sum(pen)
        centroid = jnp.sum(world_a * pen[:, None], axis=0) / jnp.maximum(wsum, 1e-12)
        n_local = eqs_b[face[best], :3]
        n_world = rot_b @ n_local  # outward from b = push direction for a
        r = centroid - pos_a
        max_pen = jnp.max(pen)
        return r, n_world, max_pen, max_pen > 0

    def substep(state):
        quat, pos, linvel, angvel = state
        linvel = linvel + jnp.where(
            (scene.inv_mass > 0)[:, None], g[None, :] * h, jnp.zeros(3)
        )
        pos = pos + linvel * h
        quat = _integrate_quat(quat, angvel * h, 1.0)

        # Table contacts: each body's correction reads only its own state
        # (the table is static), so the solve vectorizes over bodies with
        # EXACTLY the math of a per-body sequential loop - this cuts the
        # per-substep sequential chain from k to 1 (the chain length, not
        # the flop count, dominates the vmapped MCTS leaf batch; measured
        # round 3, scripts/profile_mcts_steps.py).
        r_t, n_t, depth_t, act_t = jax.vmap(table_contact)(
            quat, pos, scene.hull_pts, scene.hull_mask
        )
        if scene.body_active is not None:
            act_t = act_t & scene.body_active
        pos, quat, linvel, angvel = jax.vmap(
            functools.partial(
                _apply_contact, friction=friction, restitution=restitution
            )
        )(pos, quat, linvel, angvel, scene.inv_mass, scene.inv_inertia,
          r_t, n_t, depth_t, act_t)

        # Pairwise contacts: push dynamic body a out of every other body b.
        # Gauss-Seidel ACROSS bodies (body a sees 0..a-1 already corrected,
        # as before), Jacobi WITHIN one body's contacts (its corrections
        # against all colliders are computed from the same state and summed;
        # identical to the sequential solve whenever a body touches at most
        # one other - the overwhelmingly common case - and k x shorter
        # sequential chain otherwise).
        def solve_pairs_for(a, st):
            q_, p_, lv_, av_ = st

            def contact_vs(b):
                r, n, depth, act = body_body_contact(
                    q_[a], p_[a], scene.hull_pts[a], scene.hull_mask[a],
                    q_[b], p_[b], scene.hull_eqs[b],
                )
                act = act & (a != b)
                if scene.body_active is not None:
                    # Inactive bodies must not collide in either role: a's
                    # side is already masked via hull_mask, but b's hull_eqs
                    # would otherwise act as an invisible static collider.
                    act = act & scene.body_active[a] & scene.body_active[b]
                return _contact_deltas(
                    p_[a], q_[a], lv_[a], av_[a],
                    scene.inv_mass[a], scene.inv_inertia[a], r, n, depth, act,
                    friction=friction, restitution=restitution,
                )

            dpos, drot, dlin, dang = jax.vmap(contact_vs)(jnp.arange(k))
            dpos, drot = jnp.sum(dpos, axis=0), jnp.sum(drot, axis=0)
            dlin, dang = jnp.sum(dlin, axis=0), jnp.sum(dang, axis=0)
            return (
                q_.at[a].set(_integrate_quat(q_[a], drot, 1.0)),
                p_.at[a].set(p_[a] + dpos),
                lv_.at[a].set(lv_[a] + dlin),
                av_.at[a].set(av_[a] + dang),
            )

        quat, pos, linvel, angvel = jax.lax.fori_loop(
            0, k, solve_pairs_for, (quat, pos, linvel, angvel)
        )

        linvel = linvel * damping
        angvel = angvel * damping
        return quat, pos, linvel, angvel

    def step(_, state):
        return jax.lax.fori_loop(0, substeps, lambda __, s: substep(s), state)

    init = (
        init_quat,
        init_pos,
        jnp.zeros((k, 3)),
        jnp.zeros((k, 3)),
    )
    quat, pos, _, _ = jax.lax.fori_loop(0, steps, step, init)
    return quat, pos


@functools.partial(
    jax.jit,
    static_argnames=("steps", "substeps", "dt", "gravity", "damping", "friction", "restitution"),
)
def settle_single_dynamic(
    scene: PhysicsScene,
    init_quat: jnp.ndarray,  # [K, 4] world
    init_pos: jnp.ndarray,  # [K, 3] world
    dyn_idx: jnp.ndarray,  # i32 scalar; -1 = no dynamic body (no-op)
    steps: int = 60,
    substeps: int = 2,
    dt: float = 1.0 / 60.0,
    gravity: float = -2.0,
    damping: float = 0.99,
    friction: float = 1.0,
    restitution: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """settle() specialized to EXACTLY ONE dynamic body (index dyn_idx).

    The MCTS leaf evaluator always settles with a single dynamic body (the
    reference's correctPhysics adds one btRigidBody with mass > 0 per node,
    UCTState.cpp:208-270); the general solver still pays the full K-body
    chain per substep - a fori_loop whose k-1 other iterations are exact
    no-ops (zeroed by inv_mass == 0) - plus [K, P, 3] hull transforms.
    Since static bodies NEVER move, this version carries only the dynamic
    body's (quat, pos, linvel, angvel), reads the static poses as loop
    constants, and scatters the result back once at the end: per-substep
    sequential chain 2 contact solves instead of k+1, and k x less contact
    math. Numerically identical to settle() with one inv_mass > 0 body,
    except static quats skip settle()'s idempotent per-substep
    renormalization (equivalence gated by tests/test_physics.py).
    """
    k = scene.hull_pts.shape[0]
    g = jnp.array([0.0, 0.0, gravity])
    h = dt / substeps
    has = dyn_idx >= 0
    dyn = jnp.clip(dyn_idx, 0, k - 1)

    inv_mass_d = jnp.where(has, scene.inv_mass[dyn], 0.0)
    inv_inertia_d = scene.inv_inertia[dyn]
    hull_d = scene.hull_pts[dyn]
    mask_d = scene.hull_mask[dyn]
    active_d = has if scene.body_active is None else has & scene.body_active[dyn]

    t_inv = se3.invert_pose(scene.table_pose)
    top = scene.table_half_extents[2]
    foot = scene.table_half_extents[:2]

    # Static colliders never move, so their hull face planes are CONSTANT in
    # world frame: sd = local·n_l + d with local = R_bᵀ(w - p_b) equals
    # w·(R_b n_l) + (d - (R_b n_l)·p_b). Precomputing (n_w, d_w) here removes
    # every per-substep static-body rotation/frame change from the loop -
    # each pair contact is then one [P, F] matmul against world planes.
    rot_all = jax.vmap(se3.quat_to_matrix)(init_quat)  # [K, 3, 3]
    n_w = jnp.einsum("kij,kfj->kfi", rot_all, scene.hull_eqs[..., :3])  # [K, F, 3]
    d_w = scene.hull_eqs[..., 3] - jnp.einsum("kfi,ki->kf", n_w, init_pos)
    eqs_world = jnp.concatenate([n_w, d_w[..., None]], axis=-1)  # [K, F, 4]

    def table_contact(quat_i, pos_i):
        # Same contact-patch model as settle().table_contact.
        rot = se3.quat_to_matrix(quat_i)
        world = hull_d @ rot.T + pos_i  # [P, 3]
        local = world @ t_inv[:3, :3].T + t_inv[:3, 3]
        in_foot = (jnp.abs(local[:, 0]) <= foot[0]) & (jnp.abs(local[:, 1]) <= foot[1])
        depth = top - local[:, 2]
        pen = jnp.where(mask_d & in_foot & (depth > 0) & (depth < 2 * top), depth, 0.0)
        wsum = jnp.sum(pen)
        centroid = jnp.sum(world * pen[:, None], axis=0) / jnp.maximum(wsum, 1e-12)
        n_world = scene.table_pose[:3, :3] @ jnp.array([0.0, 0.0, 1.0])
        r = centroid - pos_i
        max_pen = jnp.max(pen)
        return r, n_world, max_pen, max_pen > 0

    def substep(state):
        q_d, p_d, lv, av = state
        lv = lv + jnp.where(inv_mass_d > 0, g * h, jnp.zeros(3))
        p_d = p_d + lv * h
        q_d = _integrate_quat(q_d, av * h, 1.0)

        r_t, n_t, depth_t, act_t = table_contact(q_d, p_d)
        p_d, q_d, lv, av = _apply_contact(
            p_d, q_d, lv, av, inv_mass_d, inv_inertia_d,
            r_t, n_t, depth_t, act_t & active_d,
            friction=friction, restitution=restitution,
        )

        # Pair contacts vs every STATIC collider b (their poses are the
        # initial ones - statics never move), Jacobi-summed exactly like
        # settle()'s within-body solve. The dynamic hull is transformed to
        # world ONCE; each collider is one [P, F] matmul against its
        # precomputed world-frame planes.
        rot_a = se3.quat_to_matrix(q_d)
        world_a = hull_d @ rot_a.T + p_d

        def contact_vs(b):
            # body_body_contact of settle(), inlined against the carried
            # dynamic state.
            eqs_b = eqs_world[b]
            sd = world_a @ eqs_b[:, :3].T + eqs_b[:, 3][None, :]
            inside_depth = -jnp.max(sd, axis=1)
            face = jnp.argmax(sd, axis=1)
            pen = jnp.where(mask_d & (inside_depth > 0), inside_depth, 0.0)
            best = jnp.argmax(pen)
            wsum = jnp.sum(pen)
            centroid = jnp.sum(world_a * pen[:, None], axis=0) / jnp.maximum(wsum, 1e-12)
            n_world = eqs_b[face[best], :3]
            r = centroid - p_d
            max_pen = jnp.max(pen)
            act = (max_pen > 0) & (b != dyn) & active_d
            if scene.body_active is not None:
                act = act & scene.body_active[b]
            return _contact_deltas(
                p_d, q_d, lv, av, inv_mass_d, inv_inertia_d, r, n_world,
                max_pen, act, friction=friction, restitution=restitution,
            )

        dpos, drot, dlin, dang = jax.vmap(contact_vs)(jnp.arange(k))
        q_d = _integrate_quat(q_d, jnp.sum(drot, axis=0), 1.0)
        p_d = p_d + jnp.sum(dpos, axis=0)
        lv = lv + jnp.sum(dlin, axis=0)
        av = av + jnp.sum(dang, axis=0)

        return q_d, p_d, lv * damping, av * damping

    init = (init_quat[dyn], init_pos[dyn], jnp.zeros(3), jnp.zeros(3))

    def step(_, state):
        return jax.lax.fori_loop(0, substeps, lambda __, s: substep(s), state)

    q_d, p_d, _, _ = jax.lax.fori_loop(0, steps, step, init)
    # Matches settle(): any inv_mass > 0 body integrates (gravity applies
    # even when body_active masks its contacts); statics never move.
    moved = has & (inv_mass_d > 0)
    quat = init_quat.at[dyn].set(jnp.where(moved, q_d, init_quat[dyn]))
    pos = init_pos.at[dyn].set(jnp.where(moved, p_d, init_pos[dyn]))
    return quat, pos


def settle_batch(scene: PhysicsScene, init_quat: jnp.ndarray, init_pos: jnp.ndarray, **kw):
    """vmap over a leading batch dim of initial poses: [B, K, 4], [B, K, 3]."""
    return jax.vmap(lambda q, p: settle(scene, q, p, **kw))(init_quat, init_pos)


def settle_poses(
    scene: PhysicsScene, poses_world: jnp.ndarray, **kw
) -> jnp.ndarray:
    """Convenience: [K, 4, 4] world poses in -> settled [K, 4, 4] out."""
    quat = se3.matrix_to_quat(poses_world[:, :3, :3])
    pos = poses_world[:, :3, 3]
    q2, p2 = settle(scene, quat, pos, **kw)
    return se3.pose_from_rot_trans(se3.quat_to_matrix(q2), p2)
