"""Native fast-IO parser vs the pure-Python parsers."""
import os
import struct

import numpy as np
import pytest

from materialrefgs_tpu.data import colmap_loader as cl
from materialrefgs_tpu.data import native_io
from materialrefgs_tpu.utils.ply import read_ply, write_ply


def write_points3d_bin(path, n=100, rng=None):
    rng = rng or np.random.default_rng(0)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", *rng.normal(size=3)))
            f.write(struct.pack("<3B", *rng.integers(0, 255, 3)))
            f.write(struct.pack("<d", rng.random()))
            tl = int(rng.integers(0, 4))
            f.write(struct.pack("<Q", tl))
            for _ in range(tl):
                f.write(struct.pack("<ii", 0, 0))


def test_points3d_native_matches_python(tmp_path):
    p = str(tmp_path / "points3D.bin")
    write_points3d_bin(p)
    out = native_io.read_points3d(p)
    if out is None:
        pytest.skip("native lib unavailable")
    xyz_n, rgb_n, err_n = out
    xyz_p, rgb_p, err_p = cl.read_points3D_binary(p)
    np.testing.assert_allclose(xyz_n, xyz_p, atol=0)
    np.testing.assert_allclose(rgb_n, rgb_p, atol=0)
    np.testing.assert_allclose(err_n, err_p, atol=0)


def test_images_native(tmp_path):
    p = str(tmp_path / "images.bin")
    rng = np.random.default_rng(1)
    n = 5
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *rng.normal(size=4)))
            f.write(struct.pack("<3d", *rng.normal(size=3)))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            for _ in range(2):
                f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    out = native_io.read_images(p)
    if out is None:
        pytest.skip("native lib unavailable")
    qvec, tvec, camid, names = out
    ref = cl.read_extrinsics_binary(p)
    keys = sorted(ref.keys())
    for i, k in enumerate(keys):
        np.testing.assert_allclose(qvec[i], ref[k].qvec)
        np.testing.assert_allclose(tvec[i], ref[k].tvec)
        assert names[i] == ref[k].name


def test_ply_native(tmp_path, rng):
    p = str(tmp_path / "t.ply")
    props = {
        "x": rng.normal(size=50).astype(np.float32),
        "opacity": rng.normal(size=50).astype(np.float32),
    }
    write_ply(p, props)
    out = native_io.read_ply_f32(p)
    if out is None:
        pytest.skip("native lib unavailable")
    for k in props:
        np.testing.assert_allclose(out[k], props[k], atol=0)
