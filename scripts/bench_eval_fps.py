"""Eval-render FPS at the published comparison surface (800x800).

The reference measures per-frame wall clock in eval.py:39-42,70 on its
render_surfel2 path at the dataset's native resolution (Shiny Blender
Synthetic: 800^2). This benchmark loads a trained PLY, upscales the scene
cameras to 800^2 (2x the synthetic 400^2 intrinsics), and times the JITTED
surfel and surfel2 (exact-order tracer) renders.

Usage:
  python scripts/bench_eval_fps.py -m /tmp/run_flagship [--iteration 12500]
         [--res 800] [--frames 20]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scale_camera(cam, factor: float):
    from materialrefgs_tpu.cameras import Camera

    return dataclasses.replace(
        cam,
        width=int(cam.width * factor),
        height=int(cam.height * factor),
        fx=cam.fx * factor,
        fy=cam.fy * factor,
        cx=cam.cx * factor,
        cy=cam.cy * factor,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", default="/tmp/shiny_synth")
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--pair_capacity", type=int, default=1 << 22)
    ap.add_argument("--tracer_pairs", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax

    from materialrefgs_tpu import config as cfg
    from materialrefgs_tpu.models import gaussian_io
    from materialrefgs_tpu.models.env_light import EnvLightMips
    from materialrefgs_tpu.models.scene import Scene
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.ops.tracer.api import TracerConfig
    from materialrefgs_tpu.render.envgs import render_surfel2
    from materialrefgs_tpu.render.renderers import RenderOptions, render_surfel

    model_params, pipe, opt = cfg.preset_refnerf()
    model_params = dataclasses.replace(model_params, source_path=args.source_path)
    scene = Scene.load(model_params)

    pc_dir = os.path.join(args.model_path, "point_cloud")
    iters = sorted(
        int(d.split("_")[-1]) for d in os.listdir(pc_dir) if d.startswith("iteration")
    )
    it = iters[-1] if args.iteration < 0 else args.iteration
    ply_dir = os.path.join(pc_dir, f"iteration_{it}")
    model, e1, e2 = gaussian_io.load_ply(
        os.path.join(ply_dir, "point_cloud.ply"), capacity=1 << 18
    )
    env_model = None
    env_ply = os.path.join(ply_dir, "env_point_cloud.ply")
    if os.path.exists(env_ply):
        env_model, _, _ = gaussian_io.load_ply(env_ply, capacity=1 << 18)
    print(f"model: iteration_{it}, {int(model.n_alive)} gaussians, "
          f"env_gs={'yes' if env_model is not None else 'no'}", flush=True)

    factor = args.res / scene.train_cameras[0].width
    cams = [scale_camera(scene.train_cameras[i], factor) for i in range(args.frames)]
    mips = EnvLightMips.build_jit(e1) if e1 is not None else None
    bg = np.ones(3, np.float32)

    ropts = RenderOptions(
        unbiased_depth=pipe.unbiased_depth,
        srgb=opt.srgb,
        raster=RasterizeConfig(pair_capacity=args.pair_capacity),
    )
    tcfg = TracerConfig(pair_capacity=args.tracer_pairs, exact_order=True)

    results = {}

    surfel = jax.jit(render_surfel, static_argnames=("opts",))
    out = surfel(model, cams[0], bg, mips, ropts)
    jax.block_until_ready(out["render"])
    if int(out["overflow"]) > 0:
        print(f"[warn] surfel overflow {int(out['overflow'])}")
    t0 = time.time()
    for c in cams:
        out = surfel(model, c, bg, mips, ropts)
    jax.block_until_ready(out["render"])
    results["surfel_fps"] = args.frames / (time.time() - t0)
    print(f"surfel  @{args.res}^2: {results['surfel_fps']:.2f} FPS", flush=True)

    if env_model is not None:
        surfel2 = jax.jit(render_surfel2, static_argnames=("opts", "tracer_cfg"))
        out = surfel2(model, env_model, cams[0], bg, mips, ropts, tcfg)
        jax.block_until_ready(out["render"])
        if int(out["tracer_overflow"]) > 0:
            print(f"[warn] tracer overflow {int(out['tracer_overflow'])}")
        t0 = time.time()
        for c in cams:
            out = surfel2(model, env_model, c, bg, mips, ropts, tcfg)
        jax.block_until_ready(out["render"])
        results["surfel2_fps"] = args.frames / (time.time() - t0)
        print(f"surfel2 @{args.res}^2: {results['surfel2_fps']:.2f} FPS "
              f"(exact-order tracer)", flush=True)

    print(json.dumps({"res": args.res, "n_gaussians": int(model.n_alive), **results}))


if __name__ == "__main__":
    main()
