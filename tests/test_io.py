import json
import os

import numpy as np
import pytest

from materialrefgs_tpu.models import gaussian_io, gaussian_model as gm
from materialrefgs_tpu.models.env_light import EnvLightParams
from materialrefgs_tpu.utils.ply import (
    read_ply,
    read_point_cloud_ply,
    write_ply,
    write_point_cloud_ply,
)


def test_ply_roundtrip(tmp_path, rng):
    props = {
        "x": rng.normal(size=20).astype(np.float32),
        "y": rng.normal(size=20).astype(np.float32),
        "opacity": rng.normal(size=20).astype(np.float32),
    }
    p = str(tmp_path / "t.ply")
    write_ply(p, props)
    back = read_ply(p)
    for k in props:
        np.testing.assert_allclose(back[k], props[k], atol=1e-7)


def test_point_cloud_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    cols = rng.uniform(size=(30, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    write_point_cloud_ply(p, pts, cols)
    pts2, cols2, nrm = read_point_cloud_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)


def test_gaussian_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    cols = rng.uniform(size=(40, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=64)
    env1 = EnvLightParams.create(16)
    p = str(tmp_path / "point_cloud.ply")
    gaussian_io.save_ply(model, p, env1=env1)
    m2, e1, e2 = gaussian_io.load_ply(p, capacity=64)
    assert int(m2.n_alive) == 40
    np.testing.assert_allclose(
        np.asarray(m2.params.xyz)[:40], np.asarray(model.params.xyz)[:40], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m2.params.features_dc)[:40],
        np.asarray(model.params.features_dc)[:40],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m2.params.indirect_asg)[:40],
        np.asarray(model.params.indirect_asg)[:40],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m2.params.scaling)[:40], np.asarray(model.params.scaling)[:40], atol=1e-6
    )
    assert e1 is not None and e1.base.shape == (6, 16, 16, 3)
    assert e2 is None


def test_reference_trained_ply_loads_if_present():
    """Attribute-layout compatibility with the reference's save_ply."""
    # No trained reference PLY is shipped; this validates our own layout
    # matches construct_list_of_attributes ordering via a synthetic file.
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    model = gm.create_from_points(
        rng.normal(size=(8, 3)).astype(np.float32),
        rng.uniform(size=(8, 3)).astype(np.float32),
        capacity=8,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "pc.ply")
        gaussian_io.save_ply(model, p)
        v = read_ply(p)
        expected_order = (
            ["x", "y", "z", "nx", "ny", "nz", "nx2", "ny2", "nz2"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(45)]
            + [f"ind_dc_{i}" for i in range(3)]
            + [f"ind_rest_{i}" for i in range(45)]
            + [f"ind_asg_{i}" for i in range(160)]
            + ["opacity", "refl_strength", "metalness", "roughness"]
            + [f"ori_color_{i}" for i in range(3)]
            + [f"diffuse_color_{i}" for i in range(3)]
            + [f"scale_{i}" for i in range(2)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert list(v.keys()) == expected_order
