"""Multi-chip training via camera-batch data parallelism (shard_map).

The reference is single-GPU (SURVEY §2.3: no torch.distributed anywhere); the
TPU-native scale-out generalizes its one-camera step to a batch of cameras,
one per chip on a ('dp',) mesh:

  - Gaussian + env-light parameters are REPLICATED,
  - each chip rasterizes its own camera (the Pallas tile kernel runs fully
    locally — tiles/pixels are intrinsically parallel per camera),
  - per-gaussian gradients are all-reduced over ICI (jax.lax.pmean inside
    shard_map), exactly the role CUDA atomics + a hypothetical NCCL
    all-reduce would play,
  - the Adam update is computed redundantly on every chip (params stay
    replicated, no broadcast needed).

Tile-sharded single-camera rendering (splitting one image's tiles across
chips with gaussians replicated) is the second axis and reuses the same
pmean point; camera-batch DP is the primary production axis.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.config import OptimizationParams, PipelineParams
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.models.env_light import EnvLightMips
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
from materialrefgs_tpu.render.renderers import RenderOptions, render_surfel
from materialrefgs_tpu.train import losses
from materialrefgs_tpu.train.trainer import TrainState, _param_lrs, make_optimizer


def stack_cameras(cameras: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cameras)


def make_dp_production_step(
    mesh: Mesh,
    stage: str,
    opt: OptimizationParams,
    pipe: PipelineParams,
    spatial_lr_scale: float,
    raster_cfg: RasterizeConfig,
    envmap_n_samples: int = 32,
    with_warp: bool = False,
    with_mono_normal: bool = False,
    tracer_cfg=None,
    axis: str = "dp",
    **step_kwargs,
):
    """Camera-batch DP over the REAL curriculum train step (the same
    trainer.make_train_step the single-chip Trainer jits: env-GS tracing in
    surfel2, warp losses, densification stats, mask entropy, Adam surgery),
    not a reduced loss. One camera per chip; parameters replicated; the
    per-gaussian gradient pmean over ICI lives inside the step itself
    (make_train_step(axis_name=...)).

    Returns step(state, cam_batch, gt_batch, extra_batch, ncam_batch,
    ngt_batch, mesh_data=None) -> (state, metrics) where every *_batch has
    leading dim mesh.shape[axis]. extra_batch is the trainer's `extra` dict
    with every leaf stacked per-chip (scalars like iteration just
    replicated); mesh_data (MeshData | None) is replicated.
    step_kwargs forward to make_train_step (lpips_weights, detect_anomaly,
    env_{min,max}_roughness, ...)."""
    from materialrefgs_tpu.train.trainer import make_train_step

    step = make_train_step(
        stage, opt, pipe, spatial_lr_scale, raster_cfg, envmap_n_samples,
        with_warp=with_warp, with_mono_normal=with_mono_normal,
        tracer_cfg=tracer_cfg, axis_name=axis, jit=False, **step_kwargs,
    )

    def shard_step(state, cam_batch, gt_batch, extra_batch, ncam_batch,
                   ngt_batch, mesh_data):
        unb = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
        return step(
            state, unb(cam_batch), gt_batch[0], unb(extra_batch),
            unb(ncam_batch), ngt_batch[0], mesh_data,
        )

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_train_step(
    mesh: Mesh,
    opt: OptimizationParams,
    pipe: PipelineParams,
    spatial_lr_scale: float,
    raster_cfg: RasterizeConfig,
    envmap_n_samples: int = 8,
):
    """Returns step(state, cam_batch, gt_batch) -> (state, metrics), where the
    leading axis of cam_batch/gt_batch equals mesh.shape['dp']."""
    lrs_of = _param_lrs(opt, spatial_lr_scale)
    tx = make_optimizer()
    ropts = RenderOptions(
        depth_ratio=pipe.depth_ratio,
        use_asg=pipe.use_asg,
        unbiased_depth=pipe.unbiased_depth,
        srgb=opt.srgb,
        raster=raster_cfg,
    )

    def local_loss(params, env1, state, camera, gt, iteration):
        model = state.model.replace(params=params)
        mips = EnvLightMips.build(env1, n_samples=envmap_n_samples)
        pkg = render_surfel(model, camera, jnp.zeros(3), mips, ropts)
        loss, tb = losses.calculate_loss(gt, pkg, opt, iteration)
        return loss, tb

    def shard_step(state: TrainState, cam_batch: Camera, gt_batch, iteration):
        # Local shard has leading dim 1: unbatch.
        camera = jax.tree_util.tree_map(lambda x: x[0], cam_batch)
        gt = gt_batch[0]
        (loss, tb), grads = jax.value_and_grad(local_loss, argnums=(0, 1), has_aux=True)(
            state.model.params, state.env1, state, camera, gt, iteration
        )
        # ICI all-reduce of parameter gradients.
        grads = jax.lax.pmean(grads, axis_name="dp")
        loss = jax.lax.pmean(loss, axis_name="dp")
        tb = jax.lax.pmean(tb, axis_name="dp")
        gp, ge1 = grads

        updates, opt_state = tx.update(
            (gp, ge1, jax.tree_util.tree_map(jnp.zeros_like, state.env2)),
            state.opt_state,
            (state.model.params, state.env1, state.env2),
        )
        up, ue1, _ = updates
        lrs = lrs_of(state.step)
        new_p = jax.tree_util.tree_map(
            lambda p, u, lr: p - lr * u, state.model.params, up, lrs
        )
        new_e1 = state.env1.replace(
            base=state.env1.base - opt.envmap_cubemap_lr * ue1.base
        )
        state = state.replace(
            model=state.model.replace(params=new_p),
            env1=new_e1,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return state, {"loss": loss, "psnr": tb["psnr"]}

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
