"""render_surfel2 (EnvGS composite) integration test."""
import pytest as _pytest
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
from materialrefgs_tpu.ops.tracer.api import TracerConfig
from materialrefgs_tpu.render.envgs import render_surfel2
from materialrefgs_tpu.render.renderers import RenderOptions

pytestmark = _pytest.mark.slow

OPTS = RenderOptions(raster=RasterizeConfig(pair_capacity=1 << 12, interpret=True))
TCFG = TracerConfig(
    pair_capacity=1 << 12, cluster_pair_capacity=1 << 9, interpret=True
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(32, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(size=(32, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=64)
    env_pts = rng.normal(size=(32, 3)).astype(np.float32) * 2.0
    env_cols = rng.uniform(size=(32, 3)).astype(np.float32)
    env_model = gm.create_from_points(env_pts, env_cols, capacity=64)
    cam = look_at_camera(
        np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.9, 0.9, 32, 32,
    )
    env = EnvLightParams.create(res=16)
    mips = EnvLightMips.build(env, min_res=8, n_samples=4)
    return model, env_model, cam, mips


@pytest.mark.core
def test_render_surfel2_runs(setup):
    model, env_model, cam, mips = setup
    out = render_surfel2(
        model, env_model, cam, jnp.zeros(3), mips, OPTS, TCFG
    )
    for k in ["render", "blend_weight", "indirect_out", "visibility", "specular_map"]:
        assert k in out, k
    assert np.all(np.isfinite(np.asarray(out["render"])))
    assert out["render"].shape == (32, 32, 3)
    assert out["indirect_out"]["render"].shape == (32, 32, 3)
    vis = np.asarray(out["visibility"])
    assert vis.min() >= 0.0 and vis.max() <= 1.0


@pytest.mark.core
def test_render_surfel2_env_gradients(setup):
    """Gradients must flow into the environment gaussians via the tracer."""
    model, env_model, cam, mips = setup

    def loss(env_params):
        em = env_model.replace(params=env_params)
        out = render_surfel2(model, em, cam, jnp.zeros(3), mips, OPTS, TCFG)
        return jnp.mean(out["render"])

    g = jax.grad(loss)(env_model.params)
    for name in ["xyz", "opacity", "features_dc"]:
        arr = np.asarray(getattr(g, name))
        assert np.all(np.isfinite(arr)), name
    total = sum(float(jnp.abs(getattr(g, n)).sum()) for n in ["xyz", "opacity", "features_dc"])
    assert total > 0, "no gradient reached the env gaussians"
