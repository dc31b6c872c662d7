"""Point-pair features: discretization, model table build, TPU lookup.

Reference semantics (match4pcsBase.cc:582-598 computePPF, :150-160
approximate_bin; table format Objects.cpp:31-49 PPFMap.txt):

  u = p1 - p2
  f1 = int(|u| * 1000)                    # mm, truncated
  f2 = int(atan2(|n1 x u|, n1.u) deg)     # [0, 180]
  f3 = int(atan2(|n2 x u|, n2.u) deg)
  f4 = int(atan2(|n1 x n2|, n1.n2) deg)
  bin(v, disc) = round-to-nearest-multiple of disc, ties to the upper multiple

with trans_disc = 5 mm and rot_disc = 10 deg. The reference stores the model
table as a hash map bin -> list of directed model point-index pairs.

TPU design: the hash map becomes (a) a dense presence bitmap over the flat
bin space for O(1) vectorized edge-factor lookups during StoCS base sampling,
and (b) a CSR (offsets + sorted pair array) for congruent-set extraction,
read with dynamic_slice + masking under a static per-row cap. Table build is
host-side numpy at asset-prep time (all N^2 directed pairs, vectorized).
"""

from __future__ import annotations

from typing import NamedTuple

from physimglobalpose_tpu import _jaxcfg  # noqa: F401  (platform/precision setup)
import jax.numpy as jnp
import numpy as np

N_ANGLE_BINS = 19  # multiples of 10 deg in [0, 180]


def n_dist_bins(max_dist_mm: int, trans_disc: int) -> int:
    return max_dist_mm // trans_disc + 1


def total_bins(max_dist_mm: int, trans_disc: int) -> int:
    return n_dist_bins(max_dist_mm, trans_disc) * N_ANGLE_BINS**3


def _approximate_bin_np(val: np.ndarray, disc: int) -> np.ndarray:
    """Reference approximate_bin (match4pcsBase.cc:150-160), vectorized."""
    lower = val - (val % disc)
    upper = lower + disc
    return np.where(val - lower < upper - val, lower, upper)


def ppf_features_np(p1, n1, p2, n2) -> np.ndarray:
    """Raw (undiscretized-int) PPF features; inputs [..., 3] -> [..., 4] int."""
    u = p1 - p2
    unorm = np.linalg.norm(u, axis=-1)
    f1 = (unorm * 1000.0).astype(np.int64)

    def angle(a, b):
        cr = np.linalg.norm(np.cross(a, b), axis=-1)
        dt = np.sum(a * b, axis=-1)
        return (np.degrees(np.arctan2(cr, dt))).astype(np.int64)

    return np.stack([f1, angle(n1, u), angle(n2, u), angle(n1, n2)], axis=-1)


def ppf_bins_np(
    p1, n1, p2, n2, trans_disc: int = 5, rot_disc: int = 10, max_dist_mm: int = 640
) -> np.ndarray:
    """Flat discretized bin index; -1 where the distance exceeds the range."""
    f = ppf_features_np(p1, n1, p2, n2)
    d = _approximate_bin_np(f[..., 0], trans_disc)
    a2 = _approximate_bin_np(f[..., 1], rot_disc) // rot_disc
    a3 = _approximate_bin_np(f[..., 2], rot_disc) // rot_disc
    a4 = _approximate_bin_np(f[..., 3], rot_disc) // rot_disc
    a2 = np.clip(a2, 0, N_ANGLE_BINS - 1)
    a3 = np.clip(a3, 0, N_ANGLE_BINS - 1)
    a4 = np.clip(a4, 0, N_ANGLE_BINS - 1)
    db = d // trans_disc
    nd = n_dist_bins(max_dist_mm, trans_disc)
    flat = ((db * N_ANGLE_BINS + a2) * N_ANGLE_BINS + a3) * N_ANGLE_BINS + a4
    return np.where(db < nd, flat, -1)


def ppf_bins_jax(
    p1, n1, p2, n2, trans_disc: int = 5, rot_disc: int = 10, max_dist_mm: int = 640
) -> jnp.ndarray:
    """Same binning as ppf_bins_np, traceable; inputs [..., 3]."""
    u = p1 - p2
    unorm = jnp.linalg.norm(u, axis=-1)
    f1 = (unorm * 1000.0).astype(jnp.int32)

    def angle(a, b):
        cr = jnp.linalg.norm(jnp.cross(a, b), axis=-1)
        dt = jnp.sum(a * b, axis=-1)
        return (jnp.degrees(jnp.arctan2(cr, dt))).astype(jnp.int32)

    def abin(val, disc):
        lower = val - (val % disc)
        upper = lower + disc
        return jnp.where(val - lower < upper - val, lower, upper)

    d = abin(f1, trans_disc)
    a2 = jnp.clip(abin(angle(n1, u), rot_disc) // rot_disc, 0, N_ANGLE_BINS - 1)
    a3 = jnp.clip(abin(angle(n2, u), rot_disc) // rot_disc, 0, N_ANGLE_BINS - 1)
    a4 = jnp.clip(abin(angle(n1, n2), rot_disc) // rot_disc, 0, N_ANGLE_BINS - 1)
    db = d // trans_disc
    nd = n_dist_bins(max_dist_mm, trans_disc)
    flat = ((db * N_ANGLE_BINS + a2) * N_ANGLE_BINS + a3) * N_ANGLE_BINS + a4
    return jnp.where(db < nd, flat, -1)


class PPFTable(NamedTuple):
    """Model PPF table in TPU-friendly dense CSR form."""

    presence: jnp.ndarray  # [n_bins] bool - does any model pair land here
    offsets: jnp.ndarray  # [n_bins] int32 - CSR row start into pairs
    counts: jnp.ndarray  # [n_bins] int32 - CSR row length
    pairs: jnp.ndarray  # [total_pairs, 2] int32 - directed (i, j), bin-sorted
    trans_disc: int
    rot_disc: int
    max_dist_mm: int


def build_ppf_table(
    points: np.ndarray,
    normals: np.ndarray,
    trans_disc: int = 5,
    rot_disc: int = 10,
    max_dist_mm: int = 640,
) -> PPFTable:
    """Build the model PPF table over all N^2-N directed point pairs.

    Equivalent content to the reference's offline PPFMap.txt (Objects.cpp:31-49).
    Uses the native C++ builder (runtime/) when available; numpy fallback.
    """
    try:
        from physimglobalpose_tpu.runtime import build_ppf_native

        nat = build_ppf_native(points, normals, trans_disc, rot_disc, max_dist_mm)
    except Exception:
        nat = None
    if nat is not None:
        offsets_n, counts_n, pairs_n = nat
        return PPFTable(
            presence=jnp.asarray(counts_n > 0),
            offsets=jnp.asarray(offsets_n),
            counts=jnp.asarray(counts_n),
            pairs=jnp.asarray(pairs_n),
            trans_disc=trans_disc,
            rot_disc=rot_disc,
            max_dist_mm=max_dist_mm,
        )
    n = len(points)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mask = ii != jj
    ii, jj = ii[mask], jj[mask]
    bins = ppf_bins_np(
        points[ii], normals[ii], points[jj], normals[jj], trans_disc, rot_disc, max_dist_mm
    )
    keep = bins >= 0
    ii, jj, bins = ii[keep], jj[keep], bins[keep]
    order = np.argsort(bins, kind="stable")
    bins_s = bins[order]
    pairs = np.stack([ii[order], jj[order]], axis=1).astype(np.int32)
    nb = total_bins(max_dist_mm, trans_disc)
    offsets = np.searchsorted(bins_s, np.arange(nb)).astype(np.int32)
    counts = np.diff(np.append(offsets, len(bins_s))).astype(np.int32)
    presence = counts > 0
    return PPFTable(
        presence=jnp.asarray(presence),
        offsets=jnp.asarray(offsets),
        counts=jnp.asarray(counts),
        pairs=jnp.asarray(pairs),
        trans_disc=trans_disc,
        rot_disc=rot_disc,
        max_dist_mm=max_dist_mm,
    )


def lookup_presence(table: PPFTable, flat_bins: jnp.ndarray) -> jnp.ndarray:
    """Vectorized presence lookup; -1 bins -> False."""
    safe = jnp.clip(flat_bins, 0, table.presence.shape[0] - 1)
    return jnp.where(flat_bins >= 0, table.presence[safe], False)


def gather_pairs(
    table: PPFTable, flat_bin: jnp.ndarray, max_pairs: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fetch up to max_pairs model pairs for one bin.

    Returns (pairs [max_pairs, 2] int32, mask [max_pairs] bool). Rows longer
    than max_pairs are truncated (the reference randomly subsamples congruent
    sets anyway, match4pcsBase.cc:1864-1871).
    """
    import jax

    safe_bin = jnp.clip(flat_bin, 0, table.offsets.shape[0] - 1)
    start = table.offsets[safe_bin]
    count = jnp.where(flat_bin >= 0, table.counts[safe_bin], 0)
    count = jnp.minimum(count, max_pairs)
    # Tail padding keeps the fixed-size window in-bounds for every row start
    # without shifting it (a shifted window would gather neighboring rows).
    padded = jnp.concatenate(
        [table.pairs, jnp.zeros((max_pairs, 2), table.pairs.dtype)], axis=0
    )
    rows = jax.lax.dynamic_slice(padded, (start, 0), (max_pairs, 2))
    mask = jnp.arange(max_pairs) < count
    return jnp.where(mask[:, None], rows, 0), mask
