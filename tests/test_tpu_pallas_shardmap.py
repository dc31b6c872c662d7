"""On-TPU: the production Pallas LCP kernel composed with mesh sharding.

VERDICT r4 Weak #5: every sharded path (parallel/sharding.py, the dryrun)
runs with use_pallas=False because Pallas cannot lower on the CPU test mesh,
so the production kernel had never executed inside the sharded machinery.
This gate runs sharded_lcp_scores(use_pallas=True) on a real-TPU mesh and
checks it against the plain unsharded XLA scorer.

Run on the chip with
  PPG_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_pallas_shardmap.py -q
(the conftest forces CPU otherwise). Chip-run results are recorded in
CLAUDE.md's on-chip gate list.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas lowering needs the real TPU backend",
)


def _inputs(h=512, nm=256, ns=512, seed=0):
    rng = np.random.default_rng(seed)
    model = rng.uniform(-0.04, 0.04, (nm, 3)).astype(np.float32)
    nrm = rng.normal(size=(nm, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    seg = rng.uniform(-0.1, 0.1, (ns, 3)).astype(np.float32) + [0, 0, 0.7]
    seg_nrm = rng.normal(size=(ns, 3)).astype(np.float32)
    seg_nrm /= np.linalg.norm(seg_nrm, axis=1, keepdims=True)
    seg_prob = rng.uniform(0.2, 1.0, ns).astype(np.float32)
    seg_mask = np.ones(ns, bool)
    tfs = np.tile(np.eye(4, dtype=np.float32), (h, 1, 1))
    tfs[:, :3, 3] = rng.uniform(-0.05, 0.05, (h, 3)) + [0, 0, 0.7]
    return tfs, model, nrm, seg, seg_nrm, seg_prob, seg_mask


def test_sharded_lcp_pallas_matches_unsharded_xla():
    import jax.numpy as jnp

    from physimglobalpose_tpu.ops import lcp
    from physimglobalpose_tpu.parallel import mesh as mesh_mod
    from physimglobalpose_tpu.parallel.sharding import sharded_lcp_scores

    mesh = mesh_mod.make_mesh()  # whatever the chip offers (1 device here)
    tfs, model, nrm, seg, seg_nrm, seg_prob, seg_mask = _inputs()

    got = np.asarray(
        sharded_lcp_scores(
            mesh, jnp.asarray(tfs), jnp.asarray(model), jnp.asarray(nrm),
            jnp.asarray(seg), jnp.asarray(seg_nrm), jnp.asarray(seg_prob),
            jnp.asarray(seg_mask), use_pallas=True,
        )
    )
    want = np.asarray(
        lcp.lcp_scores(
            jnp.asarray(tfs), jnp.asarray(model), jnp.asarray(nrm),
            jnp.asarray(seg), jnp.asarray(seg_nrm), jnp.asarray(seg_prob),
            jnp.asarray(seg_mask), use_pallas=False,
        )
    )
    assert got.shape == want.shape == (len(tfs),)
    # The Pallas kernel computes in bf16-accumulate-f32 on the MXU; the XLA
    # reference in f32 - scores are [0, 1] sums over 512 points, so 5e-3
    # absolute agreement is the kernel's documented fidelity budget
    # (ops/lcp.py; the bench gates survival/drift rather than bitwise).
    np.testing.assert_allclose(got, want, atol=5e-3)
    # Ranking fidelity: the top-16 of the two scorers agree as SETS.
    top_p = set(np.argsort(-got)[:16])
    top_x = set(np.argsort(-want)[:16])
    assert len(top_p & top_x) >= 14, (top_p, top_x)
