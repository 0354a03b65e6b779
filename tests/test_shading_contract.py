"""Golden tests of the deferred split-sum shading contract (SURVEY §7.3):

  spec_weight = (0.04*(1-m) + albedo*m) * FG.x + FG.y
  spec_light  = env(refl, rough) * vis + (1 - vis) * indirect
  specular    = spec_light * alpha * spec_weight

against a hand-built constant environment, independent FG-LUT sampling, and
reference formulas (refl_utils.py:111-160, 364-401)."""
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
from materialrefgs_tpu.ops.brdf_lut import sample_fg_lut
from materialrefgs_tpu.render import shading
from materialrefgs_tpu.utils.transforms import normalize, reflect


def _setup(rng, H=8, W=8):
    cam = look_at_camera(
        np.array([0.0, 0.0, -3.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.8, 0.8, W, H,
    )
    # Constant env: sigmoid(logit) everywhere -> every env fetch returns c.
    c = 0.7
    logit = float(np.log(c / (1 - c)))
    env = EnvLightMips.build(EnvLightParams.create(16, init=logit), n_samples=4)

    albedo = jnp.asarray(rng.uniform(0.1, 0.9, (H, W, 3)), jnp.float32)
    # Normals pointing roughly back at the camera (world -z toward eye).
    n = rng.normal(size=(H, W, 3)) * 0.1 + np.array([0.0, 0.0, -1.0])
    normal = jnp.asarray(n / np.linalg.norm(n, axis=-1, keepdims=True), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.5, 1.0, (H, W, 1)), jnp.float32)
    metal = jnp.asarray(rng.uniform(0.0, 1.0, (H, W, 1)), jnp.float32)
    rough = jnp.asarray(rng.uniform(0.05, 0.95, (H, W, 1)), jnp.float32)
    return cam, env, c, albedo, normal, alpha, metal, rough


@pytest.mark.core
def test_specular_weight_and_masking(rng):
    cam, env, c, albedo, normal, alpha, metal, rough = _setup(rng)

    rays_d, _ = shading.camera_rays_world(cam)
    w_o = -rays_d
    nov = jnp.sum(w_o * normal, axis=-1)
    fg = sample_fg_lut(nov, rough[..., 0])
    expect_w = (0.04 * (1 - metal) + albedo * metal) * fg[..., 0:1] + fg[..., 1:2]

    # No visibility: spec = env * alpha * weight; constant env -> exactly c.
    spec, extras = shading.specular_color_surfel(
        env, albedo, cam, normal, alpha, metal, rough
    )
    np.testing.assert_allclose(
        np.asarray(extras["direct_light"]), c, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(extras["specular_weight"]), np.asarray(expect_w), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(spec),
        np.asarray(extras["direct_light"] * alpha * expect_w),
        atol=1e-6,
    )


def test_visibility_indirect_union(rng):
    """spec_light = direct*vis + (1-vis)*indirect (refl_utils.py:364-401)."""
    cam, env, c, albedo, normal, alpha, metal, rough = _setup(rng)
    vis = jnp.asarray((rng.uniform(size=(8, 8, 1)) > 0.5), jnp.float32)
    indirect = jnp.asarray(rng.uniform(size=(8, 8, 3)), jnp.float32)

    spec, extras = shading.specular_color_surfel(
        env, albedo, cam, normal, alpha, metal, rough,
        visibility=vis, indirect_light=indirect,
    )
    expect_light = extras["direct_light"] * vis + (1 - vis) * indirect
    np.testing.assert_allclose(
        np.asarray(spec),
        np.asarray(expect_light * alpha * extras["specular_weight"]),
        atol=1e-6,
    )

    # surfel2 flavor: visibility masks direct light only.
    spec2, ex2 = shading.specular_color_surfel(
        env, albedo, cam, normal, alpha, metal, rough, visibility=vis
    )
    np.testing.assert_allclose(
        np.asarray(spec2),
        np.asarray(ex2["direct_light"] * vis * alpha * ex2["specular_weight"]),
        atol=1e-6,
    )


def test_reflection_direction(rng):
    """refl = 2(n.v)n - v about the per-pixel view ray (reflection:95)."""
    cam, env, c, albedo, normal, alpha, metal, rough = _setup(rng)
    rays_d, _ = shading.camera_rays_world(cam)
    w_o = -rays_d
    r = reflect(w_o, normal)
    manual = 2.0 * jnp.sum(w_o * normal, -1, keepdims=True) * normal - w_o
    np.testing.assert_allclose(np.asarray(r), np.asarray(manual), atol=1e-6)
    # Reflection preserves length and flips the view component.
    np.testing.assert_allclose(
        np.asarray(jnp.sum(normalize(r) * normal, -1)),
        np.asarray(jnp.sum(w_o * normal, -1) / jnp.linalg.norm(w_o, axis=-1)),
        atol=1e-5,
    )
