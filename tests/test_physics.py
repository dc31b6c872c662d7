import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.geometry import se3
from physimglobalpose_tpu.ops import physics


def box_hull(size=(0.06, 0.06, 0.06)):
    sx, sy, sz = np.asarray(size) / 2
    pts = np.array(
        [[x, y, z] for x in (-sx, sx) for y in (-sy, sy) for z in (-sz, sz)],
        np.float32,
    )
    eqs = np.array(
        [
            [1, 0, 0, -sx], [-1, 0, 0, -sx],
            [0, 1, 0, -sy], [0, -1, 0, -sy],
            [0, 0, 1, -sz], [0, 0, -1, -sz],
        ],
        np.float32,
    )
    return pts, eqs


def make_scene(k=1, table_z=0.5, mass=(10.0,), sizes=None):
    p = 16
    hull_pts = np.zeros((k, p, 3), np.float32)
    hull_mask = np.zeros((k, p), bool)
    hull_eqs = np.tile(np.array([0, 0, 1, -1e9], np.float32), (k, 96, 1))
    inv_mass = np.zeros(k, np.float32)
    inv_inertia = np.zeros((k, 3), np.float32)
    for i in range(k):
        size = sizes[i] if sizes else (0.06, 0.06, 0.06)
        pts, eqs = box_hull(size)
        hull_pts[i, :8] = pts
        hull_mask[i, :8] = True
        hull_eqs[i, :6] = eqs
        if mass[i] > 0:
            inv_mass[i] = 1.0 / mass[i]
            inv_inertia[i] = np.asarray(
                physics.box_inv_inertia(jnp.asarray(pts), jnp.ones(8, bool), mass[i])
            )
    table_pose = np.eye(4, dtype=np.float32)
    table_pose[2, 3] = table_z - 0.2  # top face at z = table_z
    return physics.PhysicsScene(
        hull_pts=jnp.asarray(hull_pts),
        hull_mask=jnp.asarray(hull_mask),
        hull_eqs=jnp.asarray(hull_eqs),
        inv_mass=jnp.asarray(inv_mass),
        inv_inertia=jnp.asarray(inv_inertia),
        table_pose=jnp.asarray(table_pose),
        table_half_extents=jnp.asarray([0.4, 0.4, 0.2]),
    )


def test_box_falls_to_table():
    scene = make_scene()
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    pos = jnp.asarray([[0.0, 0.0, 0.60]])  # 7 cm above rest height (0.53)
    q2, p2 = physics.settle(scene, quat, pos, steps=120)
    p2 = np.asarray(p2)[0]
    # Rest: box center at table top + half height = 0.5 + 0.03 = 0.53.
    assert abs(p2[0]) < 0.02 and abs(p2[1]) < 0.02
    np.testing.assert_allclose(p2[2], 0.53, atol=0.01)


def test_resting_box_stays():
    scene = make_scene()
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    pos = jnp.asarray([[0.05, -0.03, 0.53]])
    q2, p2 = physics.settle(scene, quat, pos, steps=60)
    p2 = np.asarray(p2)[0]
    np.testing.assert_allclose(p2, [0.05, -0.03, 0.53], atol=0.008)
    # Orientation stays upright.
    rot = np.asarray(se3.quat_to_matrix(q2[0]))
    assert rot[2, 2] > 0.99


def test_static_body_never_moves():
    scene = make_scene(k=1, mass=(0.0,))
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    pos = jnp.asarray([[0.0, 0.0, 0.8]])  # floating, but static
    q2, p2 = physics.settle(scene, quat, pos, steps=60)
    np.testing.assert_allclose(np.asarray(p2)[0], [0.0, 0.0, 0.8], atol=1e-6)


def test_box_stacks_on_static_box():
    # A smaller dynamic box dropped onto a bigger static one (vertex-face
    # contact needs distinct footprints - see ops/physics.py docstring).
    scene = make_scene(k=2, mass=(0.0, 10.0), sizes=((0.06,) * 3, (0.04,) * 3))
    quat = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    # Static box resting at 0.53 (top at 0.56); small box dropped from above.
    pos = jnp.asarray([[0.0, 0.0, 0.53], [0.005, 0.003, 0.60]])
    q2, p2 = physics.settle(scene, quat, pos, steps=120)
    p2 = np.asarray(p2)
    # Small box rests on top of the static one: z = 0.56 + 0.02 = 0.58.
    np.testing.assert_allclose(p2[1][2], 0.58, atol=0.015)


def test_settle_batch_shapes():
    scene = make_scene()
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (4, 1, 1))
    pos = jnp.tile(jnp.asarray([[0.0, 0.0, 0.6]]), (4, 1, 1))
    q2, p2 = physics.settle_batch(scene, quat, pos, steps=30)
    assert q2.shape == (4, 1, 4) and p2.shape == (4, 1, 3)


def test_inactive_body_is_not_a_collider():
    # Body 0 inactive but positioned exactly where body 1 must fall through:
    # an inactive body must not act as an invisible static collider (its
    # hull_eqs are gated by body_active). Regression for ADVICE r1 (medium).
    scene = make_scene(k=2, mass=(0.0, 10.0), sizes=((0.08,) * 3, (0.04,) * 3))
    scene = scene._replace(
        body_active=jnp.asarray([False, True]),
        hull_mask=scene.hull_mask & jnp.asarray([False, True])[:, None],
    )
    quat = jnp.asarray([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    # Inactive big box centered at 0.54 (top at 0.58); small box dropped
    # from above would rest at 0.60 on it if it (wrongly) collided.
    pos = jnp.asarray([[0.0, 0.0, 0.54], [0.003, -0.002, 0.70]])
    _, p2 = physics.settle(scene, quat, pos, steps=150)
    # Small box must fall through to the table: z = 0.5 + 0.02 = 0.52.
    np.testing.assert_allclose(np.asarray(p2)[1][2], 0.52, atol=0.015)


def test_friction_config_controls_sliding():
    # On a tilted table, a frictionless box slides further downhill than a
    # friction=1 box (regression: friction/restitution were dead config).
    import math

    tilt = math.radians(10.0)
    table_pose = np.eye(4, dtype=np.float32)
    table_pose[:3, :3] = np.array(
        [[math.cos(tilt), 0, math.sin(tilt)], [0, 1, 0],
         [-math.sin(tilt), 0, math.cos(tilt)]], np.float32,
    )
    table_pose[2, 3] = 0.3
    scene = make_scene()._replace(table_pose=jnp.asarray(table_pose))
    # wxyz quaternion: rotate about +y by tilt so the box lies flat on the slope.
    quat = jnp.asarray([[math.cos(tilt / 2), 0.0, math.sin(tilt / 2), 0.0]])
    pos = jnp.asarray([[0.0, 0.0, 0.56]])
    _, p_fric = physics.settle(scene, quat, pos, steps=90, friction=1.0)
    _, p_slip = physics.settle(scene, quat, pos, steps=90, friction=0.0)
    slide_fric = abs(float(p_fric[0, 0]))
    slide_slip = abs(float(p_slip[0, 0]))
    assert slide_slip > slide_fric + 0.005, (slide_slip, slide_fric)


def test_restitution_reflects_normal_velocity():
    # Unit-level check of the material model in _apply_contact: with
    # restitution e, an inward contact-point velocity vn becomes -e*vn.
    quat = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    pos = jnp.zeros(3)
    linvel = jnp.asarray([0.0, 0.0, -1.0])
    angvel = jnp.zeros(3)
    n = jnp.asarray([0.0, 0.0, 1.0])
    r = jnp.zeros(3)
    for e in (0.0, 0.5):
        _, _, lv, _ = physics._apply_contact(
            pos, quat, linvel, angvel, 0.1, jnp.ones(3), r, n, 0.001, True,
            friction=0.0, restitution=e,
        )
        np.testing.assert_allclose(float(lv[2]), e, atol=1e-5)


def test_off_table_box_falls():
    scene = make_scene()
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    pos = jnp.asarray([[0.9, 0.0, 0.6]])  # outside the 0.4 half-extent footprint
    _, p2 = physics.settle(scene, quat, pos, steps=60)
    assert float(p2[0, 2]) < 0.45  # fell below table top


def test_single_dynamic_matches_general_settle():
    # settle_single_dynamic is the MCTS leaf solver: with exactly one
    # inv_mass > 0 body it must reproduce settle() (statics never move, so
    # carrying only the dynamic body's state is exact; the only permitted
    # deviation is settle()'s idempotent renormalization of static quats).
    scene = make_scene(
        k=3, mass=(0.0, 10.0, 0.0),
        sizes=[(0.06, 0.06, 0.06), (0.05, 0.05, 0.08), (0.08, 0.04, 0.05)],
    )
    rng = np.random.default_rng(7)
    q_raw = rng.normal(size=(3, 4)).astype(np.float32)
    quat = jnp.asarray(q_raw / np.linalg.norm(q_raw, axis=1, keepdims=True))
    # Body 1 (dynamic) overlapping body 0 and above the table: exercises
    # gravity, the table contact, and a pair contact in one settle.
    pos = jnp.asarray(
        [[0.0, 0.0, 0.53], [0.012, 0.01, 0.60], [0.3, 0.2, 0.525]], np.float32
    )
    q_gen, p_gen = physics.settle(scene, quat, pos, steps=60)
    q_one, p_one = physics.settle_single_dynamic(
        scene, quat, pos, jnp.asarray(1), steps=60
    )
    np.testing.assert_allclose(np.asarray(p_one), np.asarray(p_gen), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_one), np.asarray(q_gen), atol=1e-5)

    # body_active masking must match too (inactive colliders are invisible).
    scene_a = scene._replace(body_active=jnp.asarray([False, True, True]))
    q_gen, p_gen = physics.settle(scene_a, quat, pos, steps=60)
    q_one, p_one = physics.settle_single_dynamic(
        scene_a, quat, pos, jnp.asarray(1), steps=60
    )
    np.testing.assert_allclose(np.asarray(p_one), np.asarray(p_gen), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_one), np.asarray(q_gen), atol=1e-5)

    # dyn_idx = -1: no dynamic body, exact no-op.
    q_one, p_one = physics.settle_single_dynamic(
        scene, quat, pos, jnp.asarray(-1), steps=60
    )
    np.testing.assert_array_equal(np.asarray(p_one), np.asarray(pos))
    np.testing.assert_array_equal(np.asarray(q_one), np.asarray(quat))
