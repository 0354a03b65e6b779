"""End-to-end smoke: a few training steps on a synthetic scene must reduce
loss / improve PSNR and keep all state finite."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.config import OptimizationParams, PipelineParams
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
from materialrefgs_tpu.ops.rasterize.reference import rasterize_reference
from materialrefgs_tpu.train.trainer import Trainer


def synthetic_scene(rng, n_cams=4, W=32, H=32, P=64):
    """Ground-truth gaussians rendered from a ring of cameras."""
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.5
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.3 - 1.3)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.5, 0.95, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = np.zeros((P, 1), np.float32)

    cams, images = [], []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        eye = np.array([3.5 * np.sin(ang), 0.5, -3.5 * np.cos(ang)])
        cam = look_at_camera(eye, np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.9, 0.9, W, H)
        out = rasterize_reference(
            *(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats)),
            camera=cam,
            bg_color=jnp.zeros(3),
        )
        cams.append(cam)
        images.append(np.asarray(out["render"]))
    return cams, images, means


@pytest.mark.slow
def test_training_improves_psnr(rng):
    cams, images, gt_means = synthetic_scene(rng)
    # Init from noisy GT points.
    pts = gt_means + rng.normal(size=gt_means.shape).astype(np.float32) * 0.1
    cols = rng.uniform(size=(len(pts), 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=256)

    opt = dataclasses.replace(
        OptimizationParams(),
        use_perceptual_loss=False,
        initial=1,
        init_until_iter=10_000,  # stay in the initial stage
        densify_from_iter=10,
        densification_interval=20,
        feature_rest_from_iter=100_000,
        lambda_normal_render_depth=0.0,
        lambda_dist=0.0,
    )
    trainer = Trainer(
        model,
        cams,
        images,
        opt,
        PipelineParams(),
        cameras_extent=3.0,
        raster_cfg=RasterizeConfig(pair_capacity=1 << 13, interpret=True),
        envmap_res=32,
    )
    trainer.train(40, log_every=1)
    log = trainer.metrics_log
    first_psnr = np.mean([m["psnr"] for m in log[:5]])
    last_psnr = np.mean([m["psnr"] for m in log[-5:]])
    assert np.isfinite(last_psnr)
    assert last_psnr > first_psnr + 0.5, (first_psnr, last_psnr)
    # densification ran and state is sane
    assert log[-1]["n_alive"] >= 64


@pytest.mark.slow
def test_full_curriculum_stages(rng):
    """All four stages + warp + mono-normal + env-gs init compile and run."""
    cams, images, gt_means = synthetic_scene(rng, n_cams=3, W=32, H=32, P=32)
    pts = gt_means + rng.normal(size=gt_means.shape).astype(np.float32) * 0.1
    cols = rng.uniform(size=(len(pts), 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=128)

    opt = dataclasses.replace(
        OptimizationParams(),
        use_perceptual_loss=False,
        initial=1,
        init_until_iter=2,
        volume_render_until_iter=4,
        indirect_from_iter=6,
        multi_view_weight_from_iter=4,
        densify_from_iter=100_000,
        feature_rest_from_iter=100_000,
        lambda_normal_render_depth=0.05,
        normal_loss_start=0,
    )
    from materialrefgs_tpu.ops.tracer.api import TracerConfig

    masks = [np.ones((32, 32), np.float32) for _ in cams]
    priors = [
        np.tile(np.array([0.0, 0.0, -1.0], np.float32), (32, 32, 1)) for _ in cams
    ]
    nearest = [[(i + 1) % len(cams)] for i in range(len(cams))]
    trainer = Trainer(
        model,
        cams,
        images,
        opt,
        PipelineParams(),
        cameras_extent=3.0,
        raster_cfg=RasterizeConfig(pair_capacity=1 << 12, interpret=True),
        envmap_res=16,
        masks=masks,
        normal_priors=priors,
        nearest_ids=nearest,
        with_warp=True,
        tracer_cfg=TracerConfig(
            pair_capacity=1 << 12, cluster_pair_capacity=1 << 9, interpret=True
        ),
    )
    trainer.train(8, log_every=1)
    assert trainer.state.env_gs is not None  # surfel2 stage initialized EnvGS
    for m in trainer.metrics_log:
        assert np.isfinite(m["loss"]), m


def test_overflow_escalates_pair_capacity(rng):
    """A deliberately undersized pair_capacity must auto-escalate (the CUDA
    rasterizer grows its buffers dynamically; silent truncation corrupted
    round-1 training runs)."""
    cams, images, gt_means = synthetic_scene(rng, n_cams=1)
    pts = gt_means
    cols = rng.uniform(size=(len(pts), 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=128)
    opt = dataclasses.replace(
        OptimizationParams(),
        use_perceptual_loss=False,
        initial=1, init_until_iter=10_000, densify_from_iter=10**9,
        feature_rest_from_iter=100_000,
        lambda_normal_render_depth=0.0, lambda_dist=0.0,
    )
    cap0 = 1 << 7  # far below the ~64 splats x tiles pair demand
    trainer = Trainer(
        model, cams, images, opt, PipelineParams(), cameras_extent=3.0,
        raster_cfg=RasterizeConfig(pair_capacity=cap0, interpret=True),
        envmap_res=32,
    )
    trainer.train(2, log_every=1)
    assert trainer.raster_cfg.pair_capacity > cap0
    # After escalation the next step must report zero overflow.
    trainer.train(1, start_iter=3, log_every=1)
    assert trainer.metrics_log[-1]["overflow"] == 0


def test_surfel2_onset_overflow_free_by_construction(rng):
    """VERDICT r4 item 8: crossing the indirect boundary with an undersized
    tracer budget must NOT truncate the first traced step — the demand probe
    presizes pair_capacity before the surfel2 step compiles."""
    cams, images, gt_means = synthetic_scene(rng, n_cams=2, W=32, H=32, P=64)
    pts = gt_means
    cols = rng.uniform(size=(len(pts), 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=128)
    opt = dataclasses.replace(
        OptimizationParams(),
        use_perceptual_loss=False,
        initial=1,
        init_until_iter=1,
        volume_render_until_iter=0,
        indirect_from_iter=2,
        multi_view_weight_from_iter=10**9,
        densify_from_iter=10**9,
        feature_rest_from_iter=100_000,
        lambda_normal_render_depth=0.0,
        lambda_dist=0.0,
    )
    from materialrefgs_tpu.ops.tracer.api import TracerConfig

    cap0 = 1 << 6  # far below the onset trace demand
    trainer = Trainer(
        model, cams, images, opt, PipelineParams(), cameras_extent=3.0,
        raster_cfg=RasterizeConfig(pair_capacity=1 << 12, interpret=True),
        envmap_res=16,
        tracer_cfg=TracerConfig(
            pair_capacity=cap0, cluster_pair_capacity=1 << 9, interpret=True
        ),
        use_mesh_visibility=False,
    )
    trainer.train(4, log_every=1)
    # The probe ran at the boundary and sized the budget up ...
    assert trainer.tracer_cfg.pair_capacity > cap0
    # ... so every surfel2 step (iterations 3+) traced without truncation.
    surfel2_marks = [m for m in trainer.metrics_log if m["iteration"] >= 3]
    assert surfel2_marks, trainer.metrics_log
    for m in surfel2_marks:
        assert m["tracer_overflow"] == 0, m
        assert m["tracer_pairs"] > 0, m
