"""Vectorized rigid-body settle: the TPU replacement for Bullet.

Reference (PhySim.cpp): a btDiscreteDynamicsWorld with gravity (0,0,-2), a
static table box (half extents 0.4x0.4x0.2), convex-hull collision shapes,
damping 0.99, friction 1.0, restitution 0; each MCTS node places previously
decided objects as static (mass 0), the new object dynamic (mass 10), steps
60x at 1/60 s and reads back the settled pose (UCTState::correctPhysics).

TPU design: position-based dynamics (PBD). Contacts are convex vertex-face:
object hull vertices against convex plane sets — other objects' hulls AND
the table box (the table is just one more 6-face collider; one uniform
contact path instead of a special-cased top-face test). All contact
candidates are evaluated densely with masks (fixed shapes), no broadphase.
Per substep, each body's contacts against every collider are gathered into
ONE Jacobi solve (velocity fixes averaged over active contacts so a body
resting on the table while leaning on a neighbor is not tangentially damped
twice); bodies are still Gauss-Seidel ordered in the general solver. The op
count per substep — not the FLOP count — is what the sequential substep
chain pays on TPU, so the single-dynamic MCTS solver packs ALL colliders'
world planes into one [P, (K+1)*F] matmul per substep.

Known limitation of vertex-face-only contact: two convex shapes with
*exactly coincident* lateral boundaries (equal boxes perfectly stacked)
report zero depth because the penetrating vertices lie on the other hull's
side faces; real object hulls have distinct footprints, and penetration must
stay below the lateral clearance per substep (bounded by dt * fall speed).
The whole settle is one lax.fori_loop, vmapped over a batch of
scenes/hypotheses: thousands of 60-step settles run in one device launch vs
one serial Bullet world in the reference.

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


def _box_local_planes(half_extents) -> jnp.ndarray:
    """[6, 4] outward face planes of an axis-aligned box (local frame)."""
    hx, hy, hz = half_extents[0], half_extents[1], half_extents[2]
    n = jnp.array(
        [[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0], [0, -1.0, 0], [0, 0, 1.0], [0, 0, -1.0]]
    )
    d = -jnp.stack([hx, hx, hy, hy, hz, hz])
    return jnp.concatenate([n, d[:, None]], axis=-1)


def _planes_to_world(rot, pos, eqs):
    """Local plane set [.., F, 4] -> world frame under pose (rot, pos).

    n_l·x_l + d = 0 with x_l = Rᵀ(x_w − p)  ⇒  (R n_l)·x_w + (d − (R n_l)·p).
    """
    n_w = eqs[..., :3] @ rot.T
    d_w = eqs[..., 3] - n_w @ pos
    return jnp.concatenate([n_w, d_w[..., None]], axis=-1)


def _planeset_contact(world_pts, mask, planes):
    """Contact of a vertex set against ONE convex plane set (world frame).

    Normal from the deepest vertex's closest face; lever arm from the
    penetration-weighted centroid of all penetrating vertices (a one-point
    stand-in for Bullet's contact manifold: a flat face resting on a surface
    produces zero net torque instead of the tumbling kick a single
    deepest-vertex contact would give).
    Returns (centroid [3], normal [3], max_pen, active).
    """
    sd = world_pts @ planes[:, :3].T + planes[:, 3][None, :]  # [P, F]
    inside = -jnp.max(sd, axis=1)  # >0 when inside the hull
    face = jnp.argmax(sd, axis=1)  # closest face per vertex
    pen = jnp.where(mask & (inside > 0), inside, 0.0)
    best = jnp.argmax(pen)
    wsum = jnp.sum(pen)
    centroid = jnp.sum(world_pts * pen[:, None], axis=0) / jnp.maximum(wsum, 1e-12)
    n_w = planes[face[best], :3]
    max_pen = jnp.max(pen)
    return centroid, n_w, max_pen, max_pen > 0


def _solve_contacts(
    pos, quat, linvel, angvel, inv_mass, inv_inertia,
    centroids, normals, depths, act,
    friction=1.0, restitution=0.0, rot=None,
):
    """Jacobi solve of C simultaneous contacts of ONE body.

    Material model (PhySim.cpp:53-79 semantics): restitution e reflects the
    inward normal velocity to -e*vn (e=0 kills it); friction mu removes
    min(1, 0.8*mu) of the tangential contact-point velocity per solve (mu=1
    reproduces the settle behavior validated against the reference's Bullet
    envelope). Positional corrections are depth-resolving per contact and
    summed; VELOCITY fixes are averaged over active contacts (summing would
    apply the tangential damp once per contact — a body resting on the table
    while leaning on a neighbor would overshoot into reversed velocity).
    The shared inverse-inertia world tensor is computed once per solve, not
    per contact. Returns additive deltas (dpos, drot_vec, dlinvel, dangvel).
    """
    if rot is None:
        rot = se3.quat_to_matrix(quat)
    inv_i_world = rot @ jnp.diag(inv_inertia) @ rot.T
    r = centroids - pos  # [C, 3]
    rxn = jnp.cross(r, normals)
    w = inv_mass + jnp.sum(rxn * (rxn @ inv_i_world.T), axis=-1)  # [C]
    lam = jnp.where(act & (w > 0), depths / jnp.maximum(w, 1e-9), 0.0)
    p_imp = lam[:, None] * normals  # [C, 3]
    dpos = jnp.sum(p_imp, axis=0) * inv_mass
    drot = inv_i_world @ jnp.sum(jnp.cross(r, p_imp), axis=0)
    v_pt = linvel[None, :] + jnp.cross(angvel[None, :], r)  # [C, 3]
    vn = jnp.sum(v_pt * normals, axis=-1)
    v_norm_fix = (
        jnp.where(act & (vn < 0), -(1.0 + restitution) * vn, 0.0)[:, None] * normals
    )
    tan_coeff = jnp.clip(0.8 * friction, 0.0, 1.0)
    v_tan = v_pt - vn[:, None] * normals
    v_tan_fix = jnp.where(act, -tan_coeff, 0.0)[:, None] * v_tan
    dv_each = v_norm_fix + v_tan_fix  # [C, 3]
    n_act = jnp.maximum(jnp.sum(act.astype(dv_each.dtype)), 1.0)
    dlin = jnp.sum(dv_each, axis=0) / n_act
    # The 0.5 under-relaxes the angular velocity correction; full-strength
    # coupling makes single-point contact patches ring (solver stabilization
    # constant, not a material parameter).
    dang = inv_i_world @ jnp.sum(jnp.cross(r, dv_each), axis=0) * 0.5 / n_act
    use = inv_mass > 0
    zero = jnp.zeros(3)
    return (
        jnp.where(use, dpos, zero),
        jnp.where(use, drot, zero),
        jnp.where(use, dlin, zero),
        jnp.where(use, dang, zero),
    )


def _contact_deltas(
    pos, quat, linvel, angvel, inv_mass, inv_inertia, r, n, depth, active,
    friction=1.0, restitution=0.0,
):
    """Single-contact deltas (unit-test surface; see _solve_contacts)."""
    depth = jnp.asarray(depth).reshape(1)
    active = jnp.asarray(active).reshape(1)
    return _solve_contacts(
        pos, quat, linvel, angvel, inv_mass, inv_inertia,
        (pos + r)[None, :], n[None, :], depth, active,
        friction=friction, restitution=restitution,
    )


def _apply_contact(
    pos, quat, linvel, angvel, inv_mass, inv_inertia, r, n, depth, active,
    friction=1.0, restitution=0.0,
):
    """Positional contact resolution: apply one contact's deltas."""
    dpos, drot, dlin, dang = _contact_deltas(
        pos, quat, linvel, angvel, inv_mass, inv_inertia, r, n, depth, active,
        friction=friction, restitution=restitution,
    )
    use = jnp.asarray(active) & (inv_mass > 0)
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
    k = scene.hull_pts.shape[0]
    g = jnp.array([0.0, 0.0, gravity])
    h = dt / substeps

    table_planes = _planes_to_world(
        scene.table_pose[:3, :3], scene.table_pose[:3, 3],
        _box_local_planes(scene.table_half_extents),
    )  # [6, 4] constant through the settle

    def substep(state):
        quat, pos, linvel, angvel = state
        linvel = linvel + jnp.where(
            (scene.inv_mass > 0)[:, None], g[None, :] * h, jnp.zeros(3)
        )
        pos = pos + linvel * h
        quat = _integrate_quat(quat, angvel * h, 1.0)

        # One Jacobi solve per body of ALL its contacts (k-1 other hulls +
        # the table box), Gauss-Seidel ACROSS bodies: body a sees 0..a-1
        # already corrected. The table is just one more plane-set collider —
        # same contact math, one code path.
        def solve_body(a, st):
            q_, p_, lv_, av_ = st
            rot_a = se3.quat_to_matrix(q_[a])
            world_a = scene.hull_pts[a] @ rot_a.T + p_[a]  # [P, 3]
            mask_a = scene.hull_mask[a]

            def contact_vs(b):
                rot_b = se3.quat_to_matrix(q_[b])
                planes_b = _planes_to_world(rot_b, p_[b], scene.hull_eqs[b])
                c, n, d, act = _planeset_contact(world_a, mask_a, planes_b)
                act = act & (a != b)
                if scene.body_active is not None:
                    # Inactive bodies must not collide in either role: a's
                    # side is already masked via hull_mask, but b's hull_eqs
                    # would otherwise act as an invisible static collider.
                    act = act & scene.body_active[a] & scene.body_active[b]
                return c, n, d, act

            cs, ns, ds, acts = jax.vmap(contact_vs)(jnp.arange(k))
            ct, nt, dt_t, at_t = _planeset_contact(world_a, mask_a, table_planes)
            if scene.body_active is not None:
                at_t = at_t & scene.body_active[a]
            cs = jnp.concatenate([cs, ct[None]], axis=0)
            ns = jnp.concatenate([ns, nt[None]], axis=0)
            ds = jnp.concatenate([ds, dt_t[None]], axis=0)
            acts = jnp.concatenate([acts, at_t[None]], axis=0)
            dpos, drot, dlin, dang = _solve_contacts(
                p_[a], q_[a], lv_[a], av_[a],
                scene.inv_mass[a], scene.inv_inertia[a],
                cs, ns, ds, acts, friction=friction, restitution=restitution,
                rot=rot_a,
            )
            return (
                q_.at[a].set(_integrate_quat(q_[a], drot, 1.0)),
                p_.at[a].set(p_[a] + dpos),
                lv_.at[a].set(lv_[a] + dlin),
                av_.at[a].set(av_[a] + dang),
            )

        quat, pos, linvel, angvel = jax.lax.fori_loop(
            0, k, solve_body, (quat, pos, linvel, angvel)
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
    UCTState.cpp:208-270). Since static bodies NEVER move, this version
    carries only the dynamic body's (quat, pos, linvel, angvel), reads the
    static poses as loop constants, and scatters the result back once at the
    end. All colliders' face planes (the K static hulls AND the table box)
    are precomputed in WORLD frame and packed into one [(K+1)*F, 4] set, so
    each substep's whole contact detection is ONE [P, (K+1)*F] matmul plus
    per-collider segment reductions — the substep op count, not the FLOP
    count, is what the 100+-substep sequential chain pays on TPU.
    Numerically identical to settle() with one inv_mass > 0 body, except
    static quats skip settle()'s idempotent per-substep renormalization
    (equivalence gated by tests/test_physics.py).
    """
    k, p_max = scene.hull_pts.shape[:2]
    f_max = max(scene.hull_eqs.shape[-2], 6)
    g = jnp.array([0.0, 0.0, gravity])
    h = dt / substeps
    has = dyn_idx >= 0
    dyn = jnp.clip(dyn_idx, 0, k - 1)

    inv_mass_d = jnp.where(has, scene.inv_mass[dyn], 0.0)
    inv_inertia_d = scene.inv_inertia[dyn]
    hull_d = scene.hull_pts[dyn]
    mask_d = scene.hull_mask[dyn]
    active_d = has if scene.body_active is None else has & scene.body_active[dyn]

    # Static colliders never move, so their face planes are CONSTANT in
    # world frame; the table box is just one more plane-set collider. Pack
    # all K+1 colliders' world planes into one flat set once per settle.
    rot_all = jax.vmap(se3.quat_to_matrix)(init_quat)  # [K, 3, 3]
    eqs_world = jax.vmap(_planes_to_world)(rot_all, init_pos, scene.hull_eqs)  # [K, F', 4]
    table_planes = _planes_to_world(
        scene.table_pose[:3, :3], scene.table_pose[:3, 3],
        _box_local_planes(scene.table_half_extents),
    )  # [6, 4]

    def pad_faces(planes):  # pad a [.., F', 4] plane set to f_max with far planes
        short = f_max - planes.shape[-2]
        if short <= 0:
            return planes
        far = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0, -1e9]), planes.shape[:-2] + (short, 4)
        )
        return jnp.concatenate([planes, far], axis=-2)

    planes_all = jnp.concatenate(
        [pad_faces(eqs_world), pad_faces(table_planes)[None]], axis=0
    )  # [K+1, F, 4]
    pl3 = planes_all[..., :3].reshape(-1, 3)  # [(K+1)F, 3]
    pld = planes_all[..., 3].reshape(-1)
    coll_ok = jnp.arange(k) != dyn
    if scene.body_active is not None:
        coll_ok = coll_ok & scene.body_active
    coll_ok = jnp.concatenate([coll_ok, jnp.array([True])])  # table always

    def substep(state):
        q_d, p_d, lv, av = state
        lv = lv + jnp.where(inv_mass_d > 0, g * h, jnp.zeros(3))
        p_d = p_d + lv * h
        q_d = _integrate_quat(q_d, av * h, 1.0)

        # Contact detection against ALL colliders in one matmul.
        rot = se3.quat_to_matrix(q_d)
        world = hull_d @ rot.T + p_d  # [P, 3]
        sd = world @ pl3.T + pld[None, :]  # [P, (K+1)F]
        sd3 = sd.reshape(p_max, k + 1, f_max)
        inside = -jnp.max(sd3, axis=2)  # [P, K+1] >0 when inside collider
        pen = jnp.where(
            mask_d[:, None] & (inside > 0) & coll_ok[None, :], inside, 0.0
        )
        max_pen = jnp.max(pen, axis=0)  # [K+1]
        act = (max_pen > 0) & active_d
        best = jnp.argmax(pen, axis=0)  # [K+1] deepest vertex per collider
        sd_best = jnp.take_along_axis(sd3, best[None, :, None], axis=0)[0]  # [K+1, F]
        face = jnp.argmax(sd_best, axis=1)  # [K+1] closest face of deepest vertex
        normals = jnp.take_along_axis(
            planes_all[..., :3], face[:, None, None], axis=1
        )[:, 0, :]  # [K+1, 3]
        wsum = jnp.sum(pen, axis=0)
        centroids = (pen.T @ world) / jnp.maximum(wsum, 1e-12)[:, None]  # [K+1, 3]

        dpos, drot, dlin, dang = _solve_contacts(
            p_d, q_d, lv, av, inv_mass_d, inv_inertia_d,
            centroids, normals, max_pen, act,
            friction=friction, restitution=restitution, rot=rot,
        )
        q_d = _integrate_quat(q_d, drot, 1.0)
        return q_d, p_d + dpos, (lv + dlin) * damping, (av + dang) * damping

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
