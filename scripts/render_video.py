"""Fly-through frame rendering (reference utils/render_utils.py
generate_path + utils/video_utils.py; the reference encodes with mediapy,
which is absent here — this dumps a PNG sequence to <model>/video/).

Usage:
  python scripts/render_video.py -m /tmp/run_flagship -s /tmp/shiny_synth \
      [--n_frames 120] [--path ellipse|interp] [--iteration N]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--n_frames", type=int, default=120)
    ap.add_argument("--path", default="ellipse", choices=["ellipse", "interp"])
    ap.add_argument("--pair_capacity", type=int, default=1 << 21)
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.device:
        import jax

        jax.config.update(
            "jax_platforms", {"cpu": "cpu", "tpu": "axon"}[args.device]
        )
    import jax

    from materialrefgs_tpu import config as cfg
    from materialrefgs_tpu.evaluate import save_png
    from materialrefgs_tpu.models import gaussian_io
    from materialrefgs_tpu.models.env_light import EnvLightMips
    from materialrefgs_tpu.models.scene import Scene
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.render.renderers import RenderOptions, render_surfel
    from materialrefgs_tpu.utils.video import (
        generate_ellipse_path,
        interpolate_cameras,
    )

    loaded = cfg.load_config(args.model_path)
    model_params, pipe, opt = (
        loaded[:3] if loaded is not None else cfg.preset_refnerf()
    )
    model_params = dataclasses.replace(model_params, source_path=args.source_path)
    scene = Scene.load(model_params)

    pc_dir = os.path.join(args.model_path, "point_cloud")
    it = args.iteration
    if it < 0:
        it = max(
            int(d.split("_")[-1])
            for d in os.listdir(pc_dir)
            if d.startswith("iteration_")
        )
    model, e1, _ = gaussian_io.load_ply(
        os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply"),
        capacity=1 << 18,
    )
    mips = EnvLightMips.build_jit(e1)

    if args.path == "ellipse":
        cams = generate_ellipse_path(scene.train_cameras, args.n_frames)
    else:
        per = max(args.n_frames // max(len(scene.train_cameras) - 1, 1), 2)
        cams = interpolate_cameras(scene.train_cameras, per)

    ropts = RenderOptions(
        unbiased_depth=pipe.unbiased_depth, srgb=opt.srgb,
        raster=RasterizeConfig(pair_capacity=args.pair_capacity,
                               interpret=(args.device == "cpu")),
    )
    render = jax.jit(render_surfel, static_argnames=("opts",))
    out_dir = os.path.join(args.model_path, "video")
    os.makedirs(out_dir, exist_ok=True)
    bg = np.ones(3, np.float32)
    for i, cam in enumerate(cams):
        pkg = render(model, cam, bg, mips, ropts)
        save_png(
            os.path.join(out_dir, f"frame_{i:05d}.png"),
            np.clip(np.asarray(pkg["render"]), 0, 1),
        )
        if i % 20 == 0:
            print(f"frame {i}/{len(cams)}", flush=True)
    print(f"wrote {len(cams)} frames to {out_dir}")


if __name__ == "__main__":
    main()
