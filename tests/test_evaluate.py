"""Evaluator render_set + metric.txt writing."""
import os

import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.evaluate import render_set, write_metrics
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
from materialrefgs_tpu.render.renderers import RenderOptions


def test_render_set_and_metrics(tmp_path, rng):
    pts = rng.normal(size=(32, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(size=(32, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=64)
    cam = look_at_camera(
        np.array([0.0, 0.0, -4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.9, 0.9, 32, 32,
    )
    mips = EnvLightMips.build(EnvLightParams.create(16), min_res=8, n_samples=4)
    images = [rng.uniform(size=(32, 32, 3)).astype(np.float32)]
    opts = RenderOptions(raster=RasterizeConfig(pair_capacity=1 << 11, interpret=True))
    m = render_set(str(tmp_path), "test", [cam], images, model, mips, opts=opts)
    assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"]) and m["fps"] > 0
    for sub in ["renders", "gt", "normal", "depth", "albedo", "roughness", "metallic"]:
        assert os.path.exists(tmp_path / "test" / sub / "00000.png"), sub
    write_metrics(str(tmp_path), m)
    txt = (tmp_path / "metric.txt").read_text()
    assert "psnr" in txt and "fps" in txt
