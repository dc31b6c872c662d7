import numpy as np

from physimglobalpose_tpu.geometry import depthio


def test_rot16_roundtrip():
    x = np.arange(0, 65536, 97, dtype=np.uint16)
    assert np.array_equal(depthio.rot16_left(depthio.rot16_left(x, 13), 3), x)


def test_decode_matches_reference_bit_rotation():
    # Oracle from utilities.cpp:56: depthShort = (d << 13 | d >> 3), /10000.
    raw = np.array([0, 8, 80, 4096, 65535], dtype=np.uint16)
    want = ((raw << 13) | (raw >> 3)).astype(np.uint16).astype(np.float32) / 10000.0
    got = depthio.decode_depth(raw, bit_rotated=True)
    np.testing.assert_allclose(got, want)


def test_encode_decode_roundtrip_plain():
    depth = np.array([[0.0, 0.5], [1.2345, 1.9999]], dtype=np.float32)
    enc = depthio.encode_depth(depth)
    dec = depthio.decode_depth(enc, bit_rotated=False)
    np.testing.assert_allclose(dec, depth, atol=1e-4)


def test_png_roundtrip(tmp_path):
    depth = np.random.default_rng(0).uniform(0.2, 1.8, size=(16, 24)).astype(np.float32)
    path = str(tmp_path / "d.png")
    depthio.write_depth_png(path, depth)
    back = depthio.read_depth_png(path, bit_rotated=False)
    np.testing.assert_allclose(back, depth, atol=1e-4)


def test_prob_roundtrip(tmp_path):
    prob = np.random.default_rng(1).uniform(0, 1, size=(8, 8)).astype(np.float32)
    path = str(tmp_path / "p.png")
    depthio.write_prob_png(path, prob)
    back = depthio.read_prob_png(path)
    np.testing.assert_allclose(back, prob, atol=1e-4)


def test_reference_test_scene_loads():
    # The bundled scene: 640x480, depth is APC bit-rotated, plausible meters.
    depth = depthio.read_depth_png(
        "/root/reference/test-scene/frame-000000.depth.png", bit_rotated=True
    )
    assert depth.shape == (480, 640)
    valid = depth[(depth > 0.1) & (depth < 2.0)]
    assert valid.size > 10000
    assert 0.4 < np.median(valid) < 1.5

    mask = depthio.read_class_mask_png("/root/reference/test-scene/frame-000000.mask.png")
    assert mask.shape == (480, 640)
    assert set(np.unique(mask)) >= {0}
    assert mask.max() >= 1  # class ids present


def test_png_roundtrip_apc_rotated(tmp_path):
    # Writing an APC-layout scene requires the rotated encoding so the APC
    # read path (rot-left-13 decode) recovers the meters (regression: the
    # synthetic scene writers used the debug-dump encoding and APC reads
    # returned garbage depth).
    from physimglobalpose_tpu.geometry import depthio
    import numpy as np

    depth = np.array([[0.0, 0.672], [0.8, 1.9999]], np.float32)
    path = str(tmp_path / "d.png")
    depthio.write_depth_png(path, depth, bit_rotated=True)
    back = depthio.read_depth_png(path, bit_rotated=True)
    np.testing.assert_allclose(back, depth, atol=1e-4)


def test_read_depth_png_raw_matches_decoded(tmp_path):
    # The uint16 fast path sweeps ship to the device must reconstruct the
    # float image exactly: depth == raw16 / 10000 for both codecs.
    depth = np.random.default_rng(2).uniform(0.1, 1.9, size=(12, 20)).astype(np.float32)
    for rotated in (False, True):
        path = str(tmp_path / f"d{int(rotated)}.png")
        depthio.write_depth_png(path, depth, bit_rotated=rotated)
        raw = depthio.read_depth_png_raw(path, bit_rotated=rotated)
        assert raw.dtype == np.uint16
        back = depthio.read_depth_png(path, bit_rotated=rotated)
        np.testing.assert_array_equal(
            raw.astype(np.float32) / depthio.DEPTH_SCALE, back
        )


def test_load_scene_raw16_and_skip_color():
    from physimglobalpose_tpu.pipeline import scene as scene_mod

    sc = scene_mod.load_scene("/root/reference/test-scene", dataset="APC")
    assert sc.depth_raw16 is not None and sc.depth_raw16.dtype == np.uint16
    np.testing.assert_array_equal(
        sc.depth_raw16.astype(np.float32) / depthio.DEPTH_SCALE, sc.depth
    )
    sc2 = scene_mod.load_scene(
        "/root/reference/test-scene", dataset="APC", load_color=False
    )
    assert sc2.color is None
    np.testing.assert_array_equal(sc2.depth, sc.depth)
