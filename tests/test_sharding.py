"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physimglobalpose_tpu.parallel import mesh as mesh_mod
from physimglobalpose_tpu.parallel import sharding as shard_mod
from physimglobalpose_tpu.ops import lcp


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


def test_make_mesh_shape(mesh8):
    assert mesh8.devices.size == 8
    assert set(mesh8.axis_names) == {"data", "model"}


def test_sharded_lcp_matches_single_device(mesh8, rng):
    h = 64
    model = rng.uniform(-0.05, 0.05, size=(128, 3)).astype(np.float32)
    nrm = rng.normal(size=(128, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    seg = (model[:96] + [0, 0, 0.5]).astype(np.float32)
    seg_nrm = nrm[:96]
    prob = np.ones(96, np.float32)
    mask = np.ones(96, bool)
    tfs = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    tfs[:, :3, 3] = [0, 0, 0.5]
    tfs[h // 2 :, :3, 3] += rng.normal(scale=0.05, size=(h // 2, 3))

    args = (jnp.asarray(model), jnp.asarray(nrm), jnp.asarray(seg),
            jnp.asarray(seg_nrm), jnp.asarray(prob), jnp.asarray(mask))
    want = np.asarray(lcp.lcp_scores_xla(jnp.asarray(tfs), *args))
    got = np.asarray(
        shard_mod.sharded_lcp_scores(mesh8, jnp.asarray(tfs), *args, use_pallas=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dryrun_multichip():
    # Run in a subprocess: XLA's CPU collective rendezvous hard-aborts the
    # whole process when this starved host stalls past its internal timeout
    # (a flaky SIGABRT that would kill the suite); isolate + retry once.
    import subprocess
    import sys
    import time

    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import os;"
        "os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','')"
        " + ' --xla_force_host_platform_device_count=8"
        " --xla_cpu_collective_timeout_seconds=600';"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8);"
        "print('dryrun-ok')"
    )
    last = None
    for attempt in range(3):
        if attempt:
            # The failures are host-steal flakes (collective rendezvous
            # aborts when the 8 virtual devices' threads stall); a pause
            # lets a transient load spike pass before retrying.
            time.sleep(30)
        try:
            r = subprocess.run(
                [sys.executable, "-c", script], capture_output=True, text=True,
                timeout=1500, cwd="/root/repo",
            )
        except subprocess.TimeoutExpired as e:
            # A timeout is just the starved-host flake in its slowest form
            # (cold compiles under CPU steal can exceed any fixed budget) -
            # retry like any other failure instead of erroring out of the
            # loop.
            last = f"timeout after {e.timeout}s"
            continue
        if r.returncode == 0 and "dryrun-ok" in r.stdout:
            return
        last = f"rc={r.returncode}; stderr tail: {r.stderr[-1500:]}"
    raise AssertionError(f"dryrun failed 3 times: {last}")


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    refined, scores = jax.jit(fn)(*args)
    assert scores.shape == (args[0].shape[0],)
    assert bool(jnp.all(jnp.isfinite(scores)))
