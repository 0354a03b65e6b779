"""Training loop (reference train_refnerf.py:1012-1533, TPU-native).

Structure: a jitted `train_step` per render stage (initial / volume / surfel /
surfel2 — select_render_method, train_refnerf.py:1495) + small jitted ops for
densification and resets, orchestrated by a thin Python loop. All
stage-dependent loss weights (normal ladder train_refnerf.py:1138-1149,
lambda_normal_render_depth ladder :1183-1200) are computed host-side per
iteration and passed as traced scalars, so each stage compiles exactly once.

The optimizer mirrors training_setup (gaussian_model.py:434-470): Adam
(eps=1e-15) with per-param-group learning rates, an exponential xyz schedule,
frozen normal1/normal2, and a runtime-togglable opacity lr
(set_opacity_lr, train_refnerf.py:1446-1460).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.config import OptimizationParams, PipelineParams
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
from materialrefgs_tpu.render.renderers import (
    RenderOptions,
    render_initial,
    render_surfel,
    render_volume,
)
from materialrefgs_tpu.train import losses
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
from materialrefgs_tpu.utils.transforms import expon_lr


@struct.dataclass
class TrainState:
    model: gm.GaussianModel
    env1: EnvLightParams  # gaussians.env_map
    env2: EnvLightParams  # gaussians.env_map_2 (volume stage)
    opt_state: Any
    step: jax.Array  # () int32
    opacity_lr_scale: jax.Array  # () f32, 0 or 1 (set_opacity_lr toggle)


def _param_lrs(opt: OptimizationParams, spatial_lr_scale: float):
    """Per-leaf lr for GaussianParams (training_setup gaussian_model.py:440-466)."""

    def lrs(step):
        xyz_lr = expon_lr(
            step,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        )
        return gm.GaussianParams(
            xyz=xyz_lr,
            scaling=opt.scaling_lr,
            rotation=opt.rotation_lr,
            opacity=opt.opacity_lr,
            refl_strength=opt.refl_strength_lr,
            metalness=opt.metalness_lr,
            roughness=opt.roughness_lr,
            ori_color=opt.ori_color_lr,
            diffuse_color=opt.ori_color_lr,
            features_dc=opt.features_lr,
            features_rest=opt.features_lr / 20.0,
            indirect_dc=opt.indirect_lr,
            indirect_rest=opt.indirect_lr / 20.0,
            indirect_asg=opt.asg_lr,
            normal1=0.0,  # frozen (training_setup:434)
            normal2=0.0,
        )

    return lrs


def make_optimizer():
    """Adam core; lr applied per-leaf in apply_updates."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)


def init_train_state(
    model: gm.GaussianModel,
    opt: OptimizationParams,
    envmap_res: int = 128,
) -> TrainState:
    env1 = EnvLightParams.create(envmap_res)
    env2 = EnvLightParams.create(envmap_res)
    tx = make_optimizer()
    opt_state = tx.init((model.params, env1, env2))
    return TrainState(
        model=model,
        env1=env1,
        env2=env2,
        opt_state=opt_state,
        step=jnp.int32(0),
        opacity_lr_scale=jnp.float32(1.0),
    )


def select_stage(iteration: int, opt: OptimizationParams) -> str:
    """select_render_method (train_refnerf.py:1495-1506)."""
    if opt.initial and iteration <= opt.init_until_iter:
        return "initial"
    if iteration <= opt.volume_render_until_iter:
        return "volume"
    if iteration <= opt.indirect_from_iter:
        return "surfel"
    return "surfel2"


def normal_gamma_schedule(iteration: int, opt: OptimizationParams) -> float:
    """Mono-normal prior weight ladder (train_refnerf.py:1138-1149)."""
    g = 0.0
    if iteration > opt.init_until_iter:
        g = 1.0
    if iteration > 7000:
        g = 0.5
    if iteration > 12000:
        g = 0.0
    if iteration > opt.normal_prop_until_iter or iteration > opt.densify_until_iter:
        g = 0.0
    if opt.indirect_from_iter < iteration < opt.indirect_from_iter + 10000:
        g = 0.0
    return g


def normal_loss_weight_schedule(iteration: int) -> float:
    """get_current_normal_loss_weight (train_refnerf.py:1183-1196)."""
    if iteration < 10000:
        return 0.015
    if iteration < 15000:
        return 0.05
    if iteration < 25000:
        return 0.1
    return 0.05


def make_train_step(
    stage: str,
    opt: OptimizationParams,
    pipe: PipelineParams,
    spatial_lr_scale: float,
    raster_cfg: RasterizeConfig,
    envmap_n_samples: int = 32,
):
    """Returns jitted step(state, camera, gt_image, extra) -> (state, metrics).

    extra: dict of traced scalars {iteration, lambda_normal_render_depth} and
    optional arrays {image_mask (H,W,1)}.
    """
    lrs_of = _param_lrs(opt, spatial_lr_scale)
    tx = make_optimizer()
    ropts = RenderOptions(
        depth_ratio=pipe.depth_ratio,
        use_asg=pipe.use_asg,
        unbiased_depth=pipe.unbiased_depth,
        indirect=False,
        srgb=opt.srgb,
        raster=raster_cfg,
    )

    def loss_fn(params, env1, env2, offset, state, camera, gt, extra):
        model = state.model.replace(params=params)
        it = extra["iteration"]
        lopt = dataclasses.replace(
            opt, lambda_normal_render_depth=0.0
        )  # weight applied manually below (it is iteration-dependent)

        if stage == "initial":
            pkg = render_initial(model, camera, extra["bg"], ropts, offset)
        elif stage == "volume":
            mips = EnvLightMips.build(env2, n_samples=envmap_n_samples)
            pkg = render_volume(model, camera, extra["bg"], mips, ropts, offset)
        else:
            mips = EnvLightMips.build(env1, n_samples=envmap_n_samples)
            pkg = render_surfel(model, camera, extra["bg"], mips, ropts, offset)

        image_weight = None
        if not opt.wo_image_weight:
            image_weight = jnp.clip(1.0 - losses.get_img_grad_weight(gt), 0, 1) ** 2
        loss, tb = losses.calculate_loss(gt, pkg, lopt, it, image_weight)

        # Iteration-dependent normal-consistency weight (ladder).
        gate = (it > opt.normal_loss_start).astype(jnp.float32)
        rn, sn = pkg["rend_normal"], pkg["surf_normal"]
        if image_weight is not None:
            ln = jnp.mean(image_weight * jnp.sum(jnp.abs(sn - rn), axis=-1))
        else:
            ln = jnp.mean(1.0 - jnp.sum(rn * sn, axis=-1))
        loss = loss + gate * extra["lambda_normal_render_depth"] * ln
        tb["loss_normal_render_depth"] = ln

        # Mask entropy after the volume stage (train_refnerf.py:1211-1220).
        if stage in ("surfel", "surfel2") and "image_mask" in extra:
            o = jnp.clip(pkg["rend_alpha"], 1e-6, 1 - 1e-6)
            msk = extra["image_mask"]
            ent = -jnp.mean(msk * jnp.log(o) + (1 - msk) * jnp.log(1 - o))
            loss = loss + 0.01 * ent
            tb["loss_mask_entropy"] = ent

        aux = {
            "tb": tb,
            "radii": pkg["radii"],
            "overflow": pkg["overflow"],
        }
        return loss, aux

    def step(state: TrainState, camera: Camera, gt, extra):
        offset = jnp.zeros((state.model.capacity, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
            state.model.params, state.env1, state.env2, offset, state, camera, gt, extra
        )
        gp, ge1, ge2, goff = grads

        updates, opt_state = tx.update(
            (gp, ge1, ge2), state.opt_state, (state.model.params, state.env1, state.env2)
        )
        up, ue1, ue2 = updates
        lrs = lrs_of(state.step)
        lrs = lrs.replace(opacity=lrs.opacity * state.opacity_lr_scale)
        new_p = jax.tree_util.tree_map(
            lambda p, u, lr: p - lr * u, state.model.params, up, lrs
        )
        env_lr = opt.envmap_cubemap_lr
        new_e1 = state.env1.replace(base=state.env1.base - env_lr * ue1.base)
        new_e2 = state.env2.replace(base=state.env2.base - env_lr * ue2.base)

        model = state.model.replace(params=new_p)
        model = gm.add_densification_stats(model, goff, aux["radii"])

        state = state.replace(
            model=model,
            env1=new_e1,
            env2=new_e2,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {k: v for k, v in aux["tb"].items()}
        metrics["loss"] = loss
        metrics["overflow"] = aux["overflow"]
        return state, metrics

    return jax.jit(step, donate_argnums=(0,))


class Trainer:
    """Python orchestration of the curriculum (train_refnerf.py:1093-1495)."""

    def __init__(
        self,
        model: gm.GaussianModel,
        cameras: list[Camera],
        images: list[np.ndarray],  # (H, W, 3) f32 in [0,1]
        opt: OptimizationParams,
        pipe: PipelineParams,
        cameras_extent: float = 3.0,
        bg_color=(0.0, 0.0, 0.0),
        raster_cfg: RasterizeConfig = RasterizeConfig(),
        seed: int = 3407,
        envmap_res: int = 128,
    ):
        self.opt = opt
        self.pipe = pipe
        self.cameras = cameras
        self.images = [jnp.asarray(im) for im in images]
        self.cameras_extent = cameras_extent
        self.bg = jnp.asarray(bg_color, jnp.float32)
        self.raster_cfg = raster_cfg
        self.state = init_train_state(model, opt, envmap_res)
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.default_rng(seed)
        self._steps: dict[str, Callable] = {}
        self._densify = jax.jit(
            lambda model, opt_state, key: gm.densify_and_prune(
                model,
                opt_state,
                key,
                max_grad=opt.densify_grad_threshold,
                min_opacity=opt.prune_opacity_threshold,
                extent=cameras_extent,
                max_screen_size=None,
            )
        )
        self._densify_sized = jax.jit(
            lambda model, opt_state, key: gm.densify_and_prune(
                model,
                opt_state,
                key,
                max_grad=opt.densify_grad_threshold,
                min_opacity=opt.prune_opacity_threshold,
                extent=cameras_extent,
                max_screen_size=20.0,
            )
        )
        self.spatial_lr_scale = cameras_extent
        self.metrics_log: list[dict] = []

    def _step_fn(self, stage: str):
        if stage not in self._steps:
            self._steps[stage] = make_train_step(
                stage, self.opt, self.pipe, self.spatial_lr_scale, self.raster_cfg
            )
        return self._steps[stage]

    def train(self, num_iters: int, start_iter: int = 1, log_every: int = 100):
        opt = self.opt
        order = []
        for iteration in range(start_iter, start_iter + num_iters):
            if not order:
                order = list(self.rng.permutation(len(self.cameras)))
            cam_id = order.pop()
            camera = self.cameras[cam_id]
            gt = self.images[cam_id]

            stage = select_stage(iteration, opt)
            if stage in ("surfel2",):
                stage = "surfel"  # EnvGS tracing lands in a later milestone

            # SH degree ladder (train_refnerf.py:1109-1111).
            if iteration > opt.feature_rest_from_iter and iteration % 1000 == 0:
                self.state = self.state.replace(model=self.state.model.oneup_sh_degree())

            extra = {
                "iteration": jnp.float32(iteration),
                "lambda_normal_render_depth": jnp.float32(
                    normal_loss_weight_schedule(iteration)
                    if opt.lambda_normal_render_depth > 0
                    else 0.0
                ),
                "bg": self.bg,
            }
            step = self._step_fn(stage)
            self.state, metrics = step(self.state, camera, gt, extra)

            self._densify_and_reset(iteration, stage)

            if iteration % log_every == 0 or iteration == start_iter:
                m = {k: float(v) for k, v in metrics.items()}
                m["iteration"] = iteration
                m["n_alive"] = int(self.state.model.n_alive)
                self.metrics_log.append(m)
        return self.state

    def _densify_and_reset(self, iteration: int, stage: str):
        """Densification + reset block (train_refnerf.py:1414-1462)."""
        opt = self.opt
        st = self.state
        if iteration >= opt.densify_until_iter or iteration == opt.volume_render_until_iter:
            return
        if iteration <= opt.init_until_iter:
            dens_interval = 100
        elif iteration <= opt.normal_prop_until_iter:
            dens_interval = opt.densification_interval_when_prop
        else:
            dens_interval = 100
        opacity_reset_interval = 3000

        if iteration > opt.densify_from_iter and iteration % dens_interval == 0:
            self.key, sub = jax.random.split(self.key)
            fn = (
                self._densify_sized
                if iteration > opt.opacity_reset_interval
                else self._densify
            )
            model, opt_state = fn(st.model, st.opt_state, sub)
            st = st.replace(model=model, opt_state=opt_state)

        has_reset0 = False
        if iteration % opacity_reset_interval == 0:
            has_reset0 = True
            model = gm.reset_opacity0(st.model)
            model = gm.reset_refl(model)
            opt_state = gm.zero_adam_param(st.opt_state, "opacity")
            opt_state = gm.zero_adam_param(opt_state, "refl_strength")
            st = st.replace(model=model, opt_state=opt_state)

        in_prop = opt.init_until_iter < iteration <= opt.normal_prop_until_iter
        if opt.opac_lr0_interval > 0 and in_prop and iteration % opt.opac_lr0_interval == 0:
            st = st.replace(opacity_lr_scale=jnp.float32(1.0))
        if in_prop and iteration % opt.normal_prop_interval == 0 and not has_reset0:
            model = gm.reset_opacity1(st.model)
            if iteration > opt.volume_render_until_iter > opt.init_until_iter:
                self.key, sub = jax.random.split(self.key)
                model = gm.dist_color(model, sub)
            model = gm.reset_scale(model)
            opt_state = gm.zero_adam_param(st.opt_state, "opacity")
            opt_state = gm.zero_adam_param(opt_state, "scaling")
            st = st.replace(model=model, opt_state=opt_state)
            if opt.opac_lr0_interval > 0 and iteration != opt.normal_prop_until_iter:
                st = st.replace(opacity_lr_scale=jnp.float32(0.0))
        self.state = st
