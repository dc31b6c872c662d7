import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from physimglobalpose_tpu.ops import icp


def make_case(rng, n_model=300, n_seg=200, perturb_deg=8.0, perturb_t=0.015):
    # Ellipsoid surface with true outward normals (meaningful for pt-to-plane).
    d = rng.normal(size=(n_model, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    radii = np.array([0.08, 0.05, 0.03])
    model = (d * radii).astype(np.float32)
    g = model / radii**2  # ellipsoid gradient = normal direction
    mnrm = (g / np.linalg.norm(g, axis=1, keepdims=True)).astype(np.float32)
    true_rot = Rotation.from_euler("xyz", [30, -10, 50], degrees=True).as_matrix()
    true_t = np.array([0.1, 0.0, 0.5])
    idx = rng.choice(n_model, n_seg, replace=False)
    seg = (model[idx] @ true_rot.T + true_t).astype(np.float32)
    true_pose = np.eye(4, dtype=np.float32)
    true_pose[:3, :3] = true_rot
    true_pose[:3, 3] = true_t
    # Perturbed initial pose.
    drot = Rotation.from_euler("xyz", rng.uniform(-perturb_deg, perturb_deg, 3), degrees=True).as_matrix()
    init = true_pose.copy()
    init[:3, :3] = drot @ true_pose[:3, :3]
    init[:3, 3] += rng.uniform(-perturb_t, perturb_t, 3)
    return model, mnrm, seg, true_pose, init.astype(np.float32)


def check_alignment(pose, true_pose, model, tol=0.003):
    a = model @ pose[:3, :3].T + pose[:3, 3]
    b = model @ true_pose[:3, :3].T + true_pose[:3, 3]
    return np.mean(np.linalg.norm(a - b, axis=1)) < tol


def test_point_to_plane_converges(rng):
    model, mnrm, seg, true_pose, init = make_case(rng, perturb_deg=5, perturb_t=0.01)
    mask = np.ones(len(seg), bool)
    out = np.asarray(
        icp.refine_icp(
            jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask), iters=25, point_to_plane=True,
        )
    )[0]
    assert check_alignment(out, true_pose, model)


def test_point_to_point_converges(rng):
    model, mnrm, seg, true_pose, init = make_case(rng, perturb_deg=5, perturb_t=0.01)
    mask = np.ones(len(seg), bool)
    out = np.asarray(
        icp.refine_icp(
            jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask), iters=25, point_to_plane=False,
        )
    )[0]
    assert check_alignment(out, true_pose, model)


def test_batched_refinement(rng):
    model, mnrm, seg, true_pose, _ = make_case(rng)
    mask = np.ones(len(seg), bool)
    inits = []
    for s in range(4):
        r2 = np.random.default_rng(s + 10)
        drot = Rotation.from_euler("xyz", r2.uniform(-6, 6, 3), degrees=True).as_matrix()
        ini = true_pose.copy()
        ini[:3, :3] = drot @ true_pose[:3, :3]
        ini[:3, 3] += r2.uniform(-0.01, 0.01, 3)
        inits.append(ini)
    out = np.asarray(
        icp.refine_icp(
            jnp.asarray(np.stack(inits).astype(np.float32)),
            jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask), iters=25, point_to_plane=False,
        )
    )
    for o in out:
        assert check_alignment(o, true_pose, model)


def test_trimming_survives_outliers(rng):
    model, mnrm, seg, true_pose, init = make_case(rng, perturb_deg=4, perturb_t=0.008)
    clutter = rng.uniform(-0.3, 0.3, size=(60, 3)).astype(np.float32) + true_pose[:3, 3]
    seg_all = np.concatenate([seg, clutter])
    mask = np.ones(len(seg_all), bool)
    out = np.asarray(
        icp.refine_icp(
            jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg_all), jnp.asarray(mask),
            iters=25, trim_fraction=0.7, point_to_plane=False,
        )
    )[0]
    assert check_alignment(out, true_pose, model, tol=0.004)


def test_fitness(rng):
    model, mnrm, seg, true_pose, init = make_case(rng)
    mask = np.ones(len(seg), bool)
    fits = np.asarray(
        icp.icp_fitness(
            jnp.asarray(np.stack([true_pose, np.eye(4, dtype=np.float32)])),
            jnp.asarray(model), jnp.asarray(seg), jnp.asarray(mask),
        )
    )
    assert fits[0] > 0.9
    assert fits[1] < 0.2


def test_pallas_icp_interpret_matches_xla(rng):
    import functools
    from unittest import mock

    import jax
    from jax.experimental import pallas as pl

    model, mnrm, seg, true_pose, init = make_case(rng, n_model=128, n_seg=96,
                                                  perturb_deg=5, perturb_t=0.01)
    mask = np.ones(len(seg), bool)
    want = np.asarray(
        icp.refine_icp(
            jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask), iters=8, point_to_plane=True,
        )
    )[0]
    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        got = np.asarray(
            icp.refine_icp_pallas.__wrapped__(
                jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
                jnp.asarray(seg), jnp.asarray(mask), iters=8, nm_tile=64,
            )
        )[0]
    # Both must align the model; compare final cloud positions.
    a = model @ got[:3, :3].T + got[:3, 3]
    b = model @ want[:3, :3].T + want[:3, 3]
    assert np.mean(np.linalg.norm(a - b, axis=1)) < 1e-3
    assert check_alignment(got, true_pose, model, tol=0.004)


def test_nn_refresh_reuse_converges(rng):
    # Correspondence reuse (nn_refresh=2): same refresh budget must converge
    # to the same alignment as full per-iteration NN within tolerance.
    model, mnrm, seg, true_pose, init = make_case(rng, perturb_deg=5, perturb_t=0.01)
    mask = np.ones(len(seg), bool)
    full = np.asarray(
        icp.refine_icp(
            jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask), iters=10,
        )[0]
    )
    reuse = np.asarray(
        icp.refine_icp(
            jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask), iters=10, nn_refresh=2,
        )[0]
    )
    assert check_alignment(full, true_pose, model)
    assert check_alignment(reuse, true_pose, model)
    # And reuse stays close to the full solution itself.
    a = model @ reuse[:3, :3].T + reuse[:3, 3]
    b = model @ full[:3, :3].T + full[:3, 3]
    assert np.mean(np.linalg.norm(a - b, axis=1)) < 0.002


def test_segside_icp_interpret_matches_xla(rng):
    # The segment-stationary Pallas kernel (design note in
    # _icp_corr_kernel_segside): interpreter mode on CPU vs the XLA path.
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    model, mnrm, seg, true_pose, init = make_case(rng, n_model=128, n_seg=96,
                                                  perturb_deg=5, perturb_t=0.01)
    # A second, worse initialization exercises the batch dimension.
    init2 = init.copy()
    init2[:3, 3] += [0.008, -0.006, 0.004]
    inits = jnp.asarray(np.stack([init, init2]))
    mask = np.ones(len(seg), bool)
    mask[-5:] = False
    want = np.asarray(
        icp.refine_icp(
            inits, jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask), iters=8, point_to_plane=True,
        )
    )
    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        got = np.asarray(
            icp.refine_icp_pallas_segside.__wrapped__(
                inits, jnp.asarray(model), jnp.asarray(mnrm),
                jnp.asarray(seg), jnp.asarray(mask), iters=8,
            )
        )
    for g, w in zip(got, want):
        a = model @ g[:3, :3].T + g[:3, 3]
        b = model @ w[:3, :3].T + w[:3, 3]
        assert np.mean(np.linalg.norm(a - b, axis=1)) < 1e-3
        assert check_alignment(g, true_pose, model, tol=0.004)


def test_segside_icp_paired_matches_unpaired(rng):
    # The hb=2 lane-packed pair path (d2/accT matmuls of two hypotheses in
    # one launch) must produce the same poses as the per-hypothesis path
    # (pair_hypotheses=False) - same math, different launch grouping.
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    model, mnrm, seg, true_pose, init = make_case(rng, n_model=128, n_seg=96,
                                                  perturb_deg=5, perturb_t=0.01)
    init2 = init.copy()
    init2[:3, 3] += [0.008, -0.006, 0.004]
    inits = jnp.asarray(np.stack([init, init2]))
    mask = np.ones(len(seg), bool)
    mask[-5:] = False
    args = (inits, jnp.asarray(model), jnp.asarray(mnrm),
            jnp.asarray(seg), jnp.asarray(mask))
    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        paired = np.asarray(
            icp.refine_icp_pallas_segside.__wrapped__(*args, iters=6)
        )
        unpaired = np.asarray(
            icp.refine_icp_pallas_segside.__wrapped__(
                *args, iters=6, pair_hypotheses=False
            )
        )
    np.testing.assert_allclose(paired, unpaired, atol=1e-6)


def test_segside_icp_survives_clutter(rng):
    # Welsch weighting must keep the segment-stationary kernel convergent
    # with a cluttered segment (the bench clutter workload's property).
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    model, mnrm, seg, true_pose, init = make_case(rng, n_model=128, n_seg=96,
                                                  perturb_deg=4, perturb_t=0.008)
    clutter = rng.uniform(-0.3, 0.3, size=(32, 3)).astype(np.float32) + true_pose[:3, 3]
    seg_all = np.concatenate([seg, clutter])
    mask = np.ones(len(seg_all), bool)
    orig_call = pl.pallas_call
    with mock.patch.object(pl, "pallas_call", functools.partial(orig_call, interpret=True)):
        got = np.asarray(
            icp.refine_icp_pallas_segside.__wrapped__(
                jnp.asarray(init)[None], jnp.asarray(model), jnp.asarray(mnrm),
                jnp.asarray(seg_all), jnp.asarray(mask), iters=10,
            )
        )[0]
    assert check_alignment(got, true_pose, model, tol=0.004)
