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


def test_ply_native_float32_alias_and_crlf(tmp_path):
    """Regression: 'property float32' must be COUNTED (skipping a declared
    column misaligned all later columns), and CRLF headers must not leave
    '\\r' in property names."""
    p = str(tmp_path / "alias.ply")
    rows = np.arange(6, dtype=np.float32).reshape(2, 3)
    header = (
        b"ply\r\nformat binary_little_endian 1.0\r\n"
        b"element vertex 2\r\n"
        b"property float x\r\nproperty float32 y\r\nproperty float z\r\n"
        b"end_header\r\n"
    )
    with open(p, "wb") as f:
        f.write(header)
        f.write(rows.tobytes())
    out = native_io.read_ply_f32(p)
    if out is None:
        pytest.skip("native fastio unavailable")
    assert set(out.keys()) == {"x", "y", "z"}, sorted(out.keys())
    np.testing.assert_array_equal(out["x"], rows[:, 0])
    np.testing.assert_array_equal(out["y"], rows[:, 1])
    np.testing.assert_array_equal(out["z"], rows[:, 2])


def test_ply_native_rejects_float64(tmp_path):
    """Non-f32 property types must error (-> Python fallback), never parse
    with the wrong stride."""
    p = str(tmp_path / "f64.ply")
    with open(p, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\nelement vertex 1\n"
            b"property float x\nproperty float64 y\nend_header\n"
        )
        f.write(np.zeros(3, np.float32).tobytes())
    assert native_io.read_ply_f32(p) is None


def test_points3d_hostile_track_len(tmp_path):
    """A track_len like 2^61 must fail loudly, not wrap the bounds check."""
    p = str(tmp_path / "hostile.bin")
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 0))
        f.write(struct.pack("<3d", 0, 0, 0))
        f.write(struct.pack("<3B", 0, 0, 0))
        f.write(struct.pack("<d", 0))
        f.write(struct.pack("<Q", 1 << 61))  # hostile track_len
    out = native_io.read_points3d(p)
    assert out is None
