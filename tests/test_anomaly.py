"""--detect_anomaly analog (reference train_refnerf.py:1798,1832 plumbs
torch.autograd.set_detect_anomaly): a NaN injected into the parameters must
abort the step with a report NAMING the nonfinite gradient groups."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.config import OptimizationParams, PipelineParams
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
from materialrefgs_tpu.train.trainer import Trainer


def _tiny_trainer(rng, detect_anomaly):
    P, W, H = 32, 24, 24
    pts = rng.normal(size=(P, 3)).astype(np.float32) * 0.4
    cols = rng.uniform(size=(P, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=64)
    cam = look_at_camera(
        np.array([0.0, 0.3, -3.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.9, 0.9, W, H,
    )
    images = [rng.uniform(size=(H, W, 3)).astype(np.float32)]
    opt = dataclasses.replace(
        OptimizationParams(),
        use_perceptual_loss=False,
        initial=1,
        init_until_iter=10_000,
        densify_from_iter=10_000,
        feature_rest_from_iter=100_000,
        lambda_normal_render_depth=0.0,
        lambda_dist=0.0,
    )
    return Trainer(
        model, [cam], images, opt, PipelineParams(),
        raster_cfg=RasterizeConfig(pair_capacity=1 << 12, interpret=True),
        envmap_res=16,
        detect_anomaly=detect_anomaly,
    )


@pytest.mark.core
def test_nan_param_raises_named_report(rng):
    trainer = _tiny_trainer(rng, detect_anomaly=True)
    p = trainer.state.model.params
    trainer.state = trainer.state.replace(
        model=trainer.state.model.replace(
            params=p.replace(xyz=p.xyz.at[0, 0].set(jnp.nan))
        )
    )
    with pytest.raises(FloatingPointError, match="nonfinite") as ei:
        trainer.train(1)
    # The report names the concrete offending grad groups (the injected
    # xyz NaN poisons the geometry chain but not necessarily the loss).
    assert "grad.param.xyz" in str(ei.value)


@pytest.mark.core
def test_clean_run_passes_and_reports_zero(rng):
    trainer = _tiny_trainer(rng, detect_anomaly=True)
    trainer.train(2, log_every=1)
    last = trainer.metrics_log[-1]
    nf = {k: v for k, v in last.items() if k.startswith("nonfinite/")}
    assert nf, "anomaly metrics missing from the step output"
    assert all(v == 0 for v in nf.values()), nf
