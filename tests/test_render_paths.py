"""Render-path integration tests (render_initial / render_surfel / volume)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
from materialrefgs_tpu.render.renderers import (
    RenderOptions,
    render_initial,
    render_surfel,
    render_volume,
)

OPTS = RenderOptions(raster=RasterizeConfig(pair_capacity=1 << 12, interpret=True))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(48, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(size=(48, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=64)
    cam = look_at_camera(
        np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.9, 0.9, 32, 32,
    )
    env = EnvLightParams.create(res=32)
    env = env.replace(base=jnp.asarray(rng.normal(size=(6, 32, 32, 3)), jnp.float32))
    mips = EnvLightMips.build(env, min_res=8, n_samples=8)
    return model, cam, mips


def test_render_initial(setup):
    model, cam, _ = setup
    out = render_initial(model, cam, jnp.ones(3), OPTS)
    assert out["render"].shape == (32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out["render"])))
    assert float(out["rend_alpha"].max()) > 0.1
    # bg=1 visible where alpha ~ 0
    corner = np.asarray(out["render"][0, 0])
    if float(out["rend_alpha"][0, 0, 0]) < 0.01:
        np.testing.assert_allclose(corner, 1.0, atol=0.02)


def test_render_surfel_full(setup):
    model, cam, mips = setup
    out = render_surfel(model, cam, jnp.zeros(3), mips, OPTS)
    for k in [
        "render", "diffuse_map", "specular_map", "base_color_map",
        "roughness_map", "refl_strength_map", "rend_normal", "surf_depth",
        "surf_normal", "rend_dist", "rend_distance",
    ]:
        assert k in out, k
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    # final = (1-m)*base + specular, all >= 0
    assert float(out["render"].min()) >= 0.0
    # Deferred shading must differ from pure base color.
    assert float(jnp.abs(out["render"] - out["diffuse_map_ori"]).max()) > 1e-4


def test_render_surfel_grads(setup):
    model, cam, mips = setup

    def loss(params, env_base):
        m = model.replace(params=params)
        mp = EnvLightMips.build(
            EnvLightParams(base=env_base), min_res=8, n_samples=8
        )
        out = render_surfel(m, cam, jnp.zeros(3), mp, OPTS)
        return jnp.mean(out["render"]) + jnp.mean(out["surf_depth"])

    env = EnvLightParams.create(res=32)
    g_params, g_env = jax.grad(loss, argnums=(0, 1))(model.params, env.base)
    # indirect_dc only receives gradient with opts.indirect=True (the
    # indirect map is composited but unused in this configuration).
    for name in ["xyz", "opacity", "refl_strength", "roughness", "ori_color",
                 "features_dc", "scaling", "rotation"]:
        g = np.asarray(getattr(g_params, name))
        assert np.all(np.isfinite(g)), name
        assert np.abs(g).sum() > 0, f"zero grad for {name}"
    assert np.abs(np.asarray(g_env)).sum() > 0, "env light got no gradient"


def test_render_volume(setup):
    model, cam, mips = setup
    out = render_volume(model, cam, jnp.zeros(3), mips, OPTS)
    assert out["render"].shape == (32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out["render"])))


def test_render_surfel_asg(setup):
    model, cam, mips = setup
    import dataclasses

    opts = dataclasses.replace(OPTS, use_asg=True)
    out = render_surfel(model, cam, jnp.zeros(3), mips, opts)
    assert np.all(np.isfinite(np.asarray(out["render"])))


def test_surf_normal_grads_finite_with_background(setup):
    """Regression: zero cross-products at background pixels must not NaN the
    backward of depth_to_normal (grad of sqrt at 0 = inf; inf * 0 = NaN)."""
    model, cam, mips = setup

    def loss(params):
        m = model.replace(params=params)
        out = render_surfel(m, cam, jnp.zeros(3), mips, OPTS)
        # surf_normal is zero on all background pixels of this sparse scene.
        return jnp.mean(jnp.abs(out["surf_normal"] - out["rend_normal"]))

    g = jax.grad(loss)(model.params)
    for name in ["xyz", "scaling", "rotation", "opacity"]:
        arr = np.asarray(getattr(g, name))
        assert np.all(np.isfinite(arr)), f"NaN grads via surf_normal: {name}"
