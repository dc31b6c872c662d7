"""Native C++ runtime vs pure-Python oracles."""

import numpy as np
import pytest

from physimglobalpose_tpu import runtime
from physimglobalpose_tpu.models import assets

MESHES = "/root/reference/src/physim_pose_estimation/models_visualization"


@pytest.fixture(scope="module")
def lib():
    if runtime.get_lib() is None:
        pytest.skip("native runtime unavailable (no g++?)")
    return runtime.get_lib()


@pytest.mark.parametrize(
    "name",
    ["kleenex_tissue_box.ply", "006_mustard_bottle.ply", "002_master_chef_can.ply"],
)
def test_native_ply_matches_python(lib, name):
    path = f"{MESHES}/{name}"
    py = assets.load_ply(path)
    nat = runtime.load_mesh_native(path)
    assert nat is not None
    np.testing.assert_allclose(nat[0], py.vertices, atol=0)
    np.testing.assert_array_equal(nat[1], py.faces)


def test_native_obj_matches_python(lib, tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n")
    py = assets.load_obj(str(obj))
    nat = runtime.load_mesh_native(str(obj))
    np.testing.assert_allclose(nat[0], py.vertices)
    np.testing.assert_array_equal(nat[1], py.faces)
    assert len(py.faces) == 2  # fan triangulation of the quad


def test_native_ppf_matches_numpy(lib, rng):
    from physimglobalpose_tpu.ops import ppf

    n = 60
    pts = rng.uniform(-0.05, 0.05, size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

    nat = runtime.build_ppf_native(pts, nrm, 5, 10, 640)
    assert nat is not None
    offsets_n, counts_n, pairs_n = nat

    # numpy oracle (the ops/ppf.py fallback path, bypassing the native hook)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    mask = ii != jj
    ii, jj = ii[mask], jj[mask]
    bins = ppf.ppf_bins_np(pts[ii], nrm[ii], pts[jj], nrm[jj])
    keep = bins >= 0
    ii, jj, bins = ii[keep], jj[keep], bins[keep]

    # Same totals and per-bin counts.
    assert counts_n.sum() == len(bins)
    want_counts = np.bincount(bins, minlength=len(counts_n))
    np.testing.assert_array_equal(counts_n, want_counts)
    # Same pair sets per bin (order within a bin may differ).
    nz = np.nonzero(counts_n)[0]
    for b in nz[:20]:
        got = {tuple(p) for p in pairs_n[offsets_n[b] : offsets_n[b] + counts_n[b]]}
        want = {(int(a), int(c)) for a, c in zip(ii[bins == b], jj[bins == b])}
        assert got == want
