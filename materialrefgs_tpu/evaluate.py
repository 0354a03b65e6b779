"""Evaluation (reference eval.py): render train/test sets, compute
PSNR/SSIM (+FPS), dump per-map PNGs and metric.txt.

LPIPS divergence: the reference uses lpipsPyTorch with pretrained VGG
weights; this environment has no pretrained weights available offline, so
LPIPS is reported as None (the metric.txt line is kept for format parity).
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.models.env_light import EnvLightMips
from materialrefgs_tpu.models.gaussian_model import GaussianModel
from materialrefgs_tpu.ops.tracer.api import TracerConfig
from materialrefgs_tpu.render.envgs import render_surfel2
from materialrefgs_tpu.render.renderers import RenderOptions, render_surfel
from materialrefgs_tpu.train.losses import psnr, ssim


def save_png(path: str, img: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(img), 0, 1)
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    # Round like torchvision save_image (mul(255).add_(0.5)); truncation
    # would darken every dumped PNG by ~0.5/255 vs the reference's.
    Image.fromarray((arr * 255 + 0.5).astype(np.uint8)).save(path)


def depth_vis(depth: np.ndarray) -> np.ndarray:
    d = np.asarray(depth)
    lo, hi = np.percentile(d[d > 0], 2) if (d > 0).any() else 0, d.max() + 1e-8
    return np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)


def render_set(
    out_dir: str,
    name: str,
    cameras: list[Camera],
    images: list[np.ndarray],
    model: GaussianModel,
    envmap: EnvLightMips,
    env_model: GaussianModel | None = None,
    opts: RenderOptions = RenderOptions(),
    tracer_cfg: TracerConfig = TracerConfig(),
    dump_maps: bool = True,
    bg_color=(0.0, 0.0, 0.0),
    stage: str = "surfel",
    mesh=None,  # ops.mesh_tracer.MeshData: mesh-traced specular visibility
    gt_normals: list | None = None,  # (H, W, 3) world normals in [-1, 1]
    gt_normal_masks: list | None = None,  # (H, W) foreground masks
) -> dict:
    """reference eval.py:23-106 render_set: per-view metrics + map dumps.

    bg_color must match the dataset's composite background (white for the
    Shiny Blender synthetic presets) or background pixels dominate the
    error. stage="initial" evaluates the SH-color path (pre-deferred
    curriculum phases, select_render_method train_refnerf.py:1495)."""
    psnrs, ssims, times = [], [], []
    bg = jnp.asarray(bg_color, jnp.float32)

    # LPIPS(vgg) when converted weights exist (reference eval.py:52); absent
    # weights are reported as lpips=None, never as a silent zero.
    from materialrefgs_tpu.train import lpips as lpips_mod

    lpips_fn = None
    if lpips_mod.weights_available():
        lpips_fn = lpips_mod.make_lpips_fn()
    lpipses = []

    def run(cam):
        if stage == "initial":
            from materialrefgs_tpu.render.renderers import render_initial

            return render_initial(model, cam, bg, opts)
        if stage == "volume":
            # Mid-curriculum volume checkpoints shade per-gaussian with the
            # envmap the CALLER built (env2 for the volume stage).
            from materialrefgs_tpu.render.renderers import render_volume

            return render_volume(model, cam, bg, envmap, opts)
        if env_model is not None:
            return render_surfel2(
                model, env_model, cam, bg, envmap, opts, tracer_cfg, mesh=mesh
            )
        return render_surfel(model, cam, bg, envmap, opts)

    run_jit = jax.jit(run)
    normal_maes = []
    cull_warned = False
    for idx, (cam, gt) in enumerate(zip(cameras, images)):
        t0 = time.perf_counter()
        pkg = run_jit(cam)
        jax.block_until_ready(pkg["render"])
        times.append(time.perf_counter() - t0)
        gt = jnp.clip(jnp.asarray(gt), 0.0, 1.0)
        # Reference protocol clamps to [0,1] before every metric
        # (eval.py:44-50); deferred specular can overshoot 1.
        render_c = jnp.clip(pkg["render"], 0.0, 1.0)
        if (
            not cull_warned
            and "mesh_cull_dropped" in pkg
            and int(pkg["mesh_cull_dropped"]) > 0
        ):
            print(
                f"[warn] eval view {idx}: mesh pre-cull dropped "
                f"{int(pkg['mesh_cull_dropped'])} occluder clusters — "
                f"visibility maps are truncated; raise TracerConfig."
                f"mesh_cull_cap"
            )
            cull_warned = True
        psnrs.append(float(psnr(render_c, gt)))
        ssims.append(float(ssim(render_c, gt)))
        if gt_normals is not None:
            # GT-normal mean angular error in degrees over the foreground
            # (Glossy Synthetic eval; NeRO-style datasets ship GT normals).
            ng = np.asarray(gt_normals[idx], np.float32)
            ng = ng / np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-8)
            npred = np.asarray(pkg["rend_normal"], np.float32)
            npred = npred / np.maximum(
                np.linalg.norm(npred, axis=-1, keepdims=True), 1e-8
            )
            m = (
                np.asarray(gt_normal_masks[idx], np.float32)
                if gt_normal_masks is not None
                else np.asarray(pkg["rend_alpha"], np.float32)[..., 0] > 0.5
            )
            cosang = np.clip(np.sum(ng * npred, axis=-1), -1.0, 1.0)
            ang = np.degrees(np.arccos(cosang))
            denom = max(float(np.sum(m)), 1.0)
            normal_maes.append(float(np.sum(ang * m) / denom))
        if lpips_fn is not None:
            lpipses.append(float(lpips_fn(render_c, gt)))
        if dump_maps:
            base = os.path.join(out_dir, name)
            save_png(f"{base}/renders/{idx:05d}.png", pkg["render"])
            save_png(f"{base}/gt/{idx:05d}.png", gt)
            save_png(f"{base}/normal/{idx:05d}.png", np.asarray(pkg["rend_normal"]) * 0.5 + 0.5)
            save_png(f"{base}/depth/{idx:05d}.png", depth_vis(pkg["surf_depth"]))
            for key, fname in [
                ("diffuse_map", "diffuse"),
                ("specular_map", "specular"),
                ("base_color_map", "albedo"),
            ]:
                if key in pkg:
                    save_png(f"{base}/{fname}/{idx:05d}.png", pkg[key])
            for key, fname in [
                ("roughness_map", "roughness"),
                ("refl_strength_map", "metallic"),
                ("visibility", "visibility"),
            ]:
                if key in pkg:
                    save_png(f"{base}/{fname}/{idx:05d}.png", np.asarray(pkg[key])[..., 0])

    # Skip the first frame's wall time (jit compile).
    fps = 1.0 / np.mean(times[1:]) if len(times) > 1 else 1.0 / max(times[0], 1e-9)
    return {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "lpips": float(np.mean(lpipses)) if lpipses else None,
        "fps": float(fps),
        "per_view_psnr": psnrs,
        "normal_mae": float(np.mean(normal_maes)) if normal_maes else None,
    }


def write_metrics(out_dir: str, metrics: dict):
    """metric.txt (eval.py:72-74); normal_mae added for the glossy preset
    (GT-normal angular error, degrees)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metric.txt"), "w") as f:
        f.write(f"psnr: {metrics['psnr']}\n")
        f.write(f"ssim: {metrics['ssim']}\n")
        f.write(f"lpips: {metrics['lpips']}\n")
        f.write(f"fps: {metrics['fps']}\n")
        if metrics.get("normal_mae") is not None:
            f.write(f"normal_mae: {metrics['normal_mae']}\n")
