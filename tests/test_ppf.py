import jax.numpy as jnp
import numpy as np

from physimglobalpose_tpu.ops import ppf


def ref_approximate_bin(val, disc):
    # Scalar oracle from match4pcsBase.cc:150-160.
    lower = val - (val % disc)
    upper = lower + disc
    return lower if val - lower < upper - val else upper


def ref_ppf(p1, n1, p2, n2):
    # Scalar oracle from match4pcsBase.cc:582-598.
    u = p1 - p2
    f1 = int(np.linalg.norm(u) * 1000)
    f2 = int(np.degrees(np.arctan2(np.linalg.norm(np.cross(n1, u)), np.dot(n1, u))))
    f3 = int(np.degrees(np.arctan2(np.linalg.norm(np.cross(n2, u)), np.dot(n2, u))))
    f4 = int(np.degrees(np.arctan2(np.linalg.norm(np.cross(n1, n2)), np.dot(n1, n2))))
    return (
        ref_approximate_bin(f1, 5),
        ref_approximate_bin(f2, 10),
        ref_approximate_bin(f3, 10),
        ref_approximate_bin(f4, 10),
    )


def random_unit(rng, n):
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def test_bins_match_reference_oracle(rng):
    n = 64
    pts = rng.uniform(-0.1, 0.1, size=(n, 3)).astype(np.float32)
    nrm = random_unit(rng, n)
    got = ppf.ppf_bins_np(pts[: n // 2], nrm[: n // 2], pts[n // 2 :], nrm[n // 2 :])
    agree = 0
    for i in range(n // 2):
        d, a2, a3, a4 = ref_ppf(pts[i], nrm[i], pts[n // 2 + i], nrm[n // 2 + i])
        want = ((d // 5 * ppf.N_ANGLE_BINS + a2 // 10) * ppf.N_ANGLE_BINS + a3 // 10
                ) * ppf.N_ANGLE_BINS + a4 // 10
        agree += int(got[i] == want)
    # float32 vs float64 rounding at bin edges may flip a rare bin
    assert agree >= n // 2 - 1


def test_jax_matches_np(rng):
    n = 128
    p1 = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32)
    p2 = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32)
    n1, n2 = random_unit(rng, n), random_unit(rng, n)
    a = ppf.ppf_bins_np(p1, n1, p2, n2)
    b = np.asarray(ppf.ppf_bins_jax(jnp.asarray(p1), jnp.asarray(n1), jnp.asarray(p2), jnp.asarray(n2)))
    assert (a == b).mean() > 0.99  # tiny float asymmetries at bin edges only


def test_table_roundtrip(rng):
    n = 40
    pts = rng.uniform(-0.05, 0.05, size=(n, 3)).astype(np.float32)
    nrm = random_unit(rng, n)
    table = ppf.build_ppf_table(pts, nrm)
    # Every directed pair's bin must be present, and gather must return it.
    bins = ppf.ppf_bins_np(pts[0], nrm[0], pts[1], nrm[1])
    assert bool(ppf.lookup_presence(table, jnp.asarray(bins)))
    pairs, mask = ppf.gather_pairs(table, jnp.asarray(bins), 64)
    got = {tuple(p) for p, m in zip(np.asarray(pairs), np.asarray(mask)) if m}
    assert (0, 1) in got
    # And all returned pairs really have this bin.
    for i, j in got:
        assert ppf.ppf_bins_np(pts[i], nrm[i], pts[j], nrm[j]) == bins


def test_absent_bin(rng):
    pts = rng.uniform(-0.05, 0.05, size=(10, 3)).astype(np.float32)
    nrm = random_unit(rng, 10)
    table = ppf.build_ppf_table(pts, nrm)
    assert not bool(ppf.lookup_presence(table, jnp.asarray(-1)))
    pairs, mask = ppf.gather_pairs(table, jnp.asarray(-1), 16)
    assert int(mask.sum()) == 0


def test_directed_pairs(rng):
    # (i,j) and (j,i) both present (PPF is asymmetric in f2/f3).
    pts = rng.uniform(-0.05, 0.05, size=(12, 3)).astype(np.float32)
    nrm = random_unit(rng, 12)
    table = ppf.build_ppf_table(pts, nrm)
    b_ij = ppf.ppf_bins_np(pts[2], nrm[2], pts[7], nrm[7])
    b_ji = ppf.ppf_bins_np(pts[7], nrm[7], pts[2], nrm[2])
    for b, pair in [(b_ij, (2, 7)), (b_ji, (7, 2))]:
        pairs, mask = ppf.gather_pairs(table, jnp.asarray(b), 256)
        got = {tuple(p) for p, m in zip(np.asarray(pairs), np.asarray(mask)) if m}
        assert pair in got
