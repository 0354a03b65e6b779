"""Tile-sharded rasterization vs single-device: forward + gradient parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from materialrefgs_tpu.parallel.tile_sharding import rasterize_tile_sharded

CFG = RasterizeConfig(pair_capacity=1 << 13, interpret=True)


def scene(rng, P=64):
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.6
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.5 - 1.6)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = rng.uniform(size=(P, 4)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats))


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:4])
    return Mesh(devs, ("tp",))


def test_tile_sharded_matches_single(mesh, rng):
    # H=64 -> grid_y=4 -> 1 tile-row per device.
    cam = look_at_camera(
        np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.9, 0.9, 48, 64,
    )
    args = scene(rng)
    bg = jnp.array([0.2, 0.1, 0.4])
    ref = rasterize(*args, camera=cam, bg_color=bg, config=CFG)
    out = rasterize_tile_sharded(mesh, *args, camera=cam, bg_color=bg, config=CFG)
    for k in ["render", "feature", "normal", "depth", "alpha", "distortion"]:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=2e-4, rtol=1e-3,
            err_msg=k,
        )
    assert int(out["overflow"]) == 0


def test_tile_sharded_gradients(mesh, rng):
    cam = look_at_camera(
        np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.9, 0.9, 32, 64,
    )
    args = scene(rng, P=32)
    bg = jnp.zeros(3)

    def loss_single(*a):
        o = rasterize(*a, camera=cam, bg_color=bg, config=CFG)
        return jnp.mean((o["render"] - 0.3) ** 2) + 0.01 * jnp.mean(o["depth"])

    def loss_sharded(*a):
        o = rasterize_tile_sharded(mesh, *a, camera=cam, bg_color=bg, config=CFG)
        return jnp.mean((o["render"] - 0.3) ** 2) + 0.01 * jnp.mean(o["depth"])

    g1 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4))(*args)
    for n, a, b in zip(["means", "scales", "rots", "opac", "colors"], g2, g1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), n
        s = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=3e-3 * s + 1e-5, err_msg=n)
