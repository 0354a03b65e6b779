import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
from materialrefgs_tpu.ops import cubemap as cm


def test_dir_uv_roundtrip():
    """dir -> (face, u, v) must invert cube_to_dir at texel centers."""
    R = 16
    dirs = np.asarray(cm.face_dirs(R))  # (6,R,R,3)
    face, u, v = cm.dir_to_cube_uv(jnp.asarray(dirs))
    g = np.linspace(-1 + 1 / R, 1 - 1 / R, R)
    gy, gx = np.meshgrid(g, g, indexing="ij")
    for s in range(6):
        np.testing.assert_array_equal(np.asarray(face[s]), s)
        np.testing.assert_allclose(np.asarray(u[s]), gx, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v[s]), gy, atol=1e-5)


def test_sample_at_texel_centers_exact(rng):
    R = 16
    cmap = jnp.asarray(rng.normal(size=(6, R, R, 3)), jnp.float32)
    dirs = cm.face_dirs(R)
    out = cm.sample_cubemap(cmap, dirs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(cmap), atol=1e-4)


def test_sample_constant_map(rng):
    cmap = jnp.full((6, 32, 32, 3), 0.7, jnp.float32)
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = cm.sample_cubemap(cmap, jnp.asarray(d, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)


def test_avg_pool():
    cmap = jnp.arange(6 * 4 * 4 * 1, dtype=jnp.float32).reshape(6, 4, 4, 1)
    out = cm.cubemap_avg_pool(cmap)
    assert out.shape == (6, 2, 2, 1)
    np.testing.assert_allclose(
        float(out[0, 0, 0, 0]), float(cmap[0, :2, :2, 0].mean()), atol=1e-5
    )


def test_solid_angles_sum_to_sphere():
    w = np.asarray(cm.texel_solid_angles(16))
    np.testing.assert_allclose(w.sum(), 4 * np.pi, rtol=1e-3)


def test_diffuse_convolve_constant_preserved():
    cmap = jnp.full((6, 16, 16, 3), 0.25, jnp.float32)
    out = cm.diffuse_convolve(cmap)
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-4)


def test_diffuse_convolve_dominant_direction():
    """A bright +z texel patch must make the +z diffuse response largest."""
    cmap = np.zeros((6, 16, 16, 1), np.float32)
    cmap[4] = 1.0  # +z face bright
    out = np.asarray(cm.diffuse_convolve(jnp.asarray(cmap)))
    zp = out[4, 8, 8, 0]  # +z center
    zm = out[5, 8, 8, 0]  # -z center
    assert zp > 0.4 and zm < 0.1 and zp > zm


def test_ggx_prefilter_constant_preserved():
    cmap = jnp.full((6, 32, 32, 3), 0.6, jnp.float32)
    out = cm.ggx_prefilter(cmap, 0.3, n_samples=32)
    np.testing.assert_allclose(np.asarray(out), 0.6, atol=1e-3)


def test_ggx_prefilter_blurs(rng):
    cmap = jnp.asarray(rng.normal(size=(6, 32, 32, 3)), jnp.float32)
    out = cm.ggx_prefilter(cmap, 0.5, n_samples=64)
    # Blur reduces variance.
    assert float(jnp.var(out)) < float(jnp.var(cmap)) * 0.7


def test_env_light_end_to_end(rng):
    params = EnvLightParams.create(res=32)
    params = params.replace(base=jnp.asarray(rng.normal(size=(6, 32, 32, 3)), jnp.float32))
    mips = EnvLightMips.build(params, min_res=8, n_samples=16)
    assert len(mips.specular) == 3  # 32, 16, 8
    d = rng.normal(size=(50, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    rough = jnp.asarray(rng.uniform(0.05, 1.0, size=(50, 1)), jnp.float32)
    out = mips(d, roughness=rough)
    assert out.shape == (50, 3)
    assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))
    # diffuse + pure_env modes
    assert mips(d, mode="diffuse").shape == (50, 3)
    assert mips(d, mode="pure_env").shape == (50, 3)


def test_env_light_differentiable(rng):
    params = EnvLightParams.create(res=16)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

    def loss(base):
        mips = EnvLightMips.build(EnvLightParams(base=base), min_res=8, n_samples=8)
        return jnp.sum(mips(d, roughness=jnp.array([[0.3]])))

    g = jax.grad(loss)(params.base)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_get_mip_mapping():
    mip = cm.get_mip(jnp.array([0.0, 0.08, 0.29, 0.5, 0.75, 1.0]), 4)
    np.testing.assert_allclose(
        np.asarray(mip), [0.0, 0.0, 1.0, 2.0, 2.5, 3.0], atol=1e-6
    )
