"""Single-view overfit diagnostic: can the optimizer drive one view to high
PSNR? A healthy 2DGS-family optimizer reaches 30+ PSNR in a few hundred
iterations on a single 400^2 view; a plateau indicates a gradient or
optimizer-scaling defect, independent of multi-view consistency.

Usage: python scripts/overfit_probe.py -s /tmp/shiny_synth [--iters 600]
       [--views 1] [--densify] [--stage initial]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--capacity", type=int, default=1 << 17)
    ap.add_argument("--densify", action="store_true")
    ap.add_argument("--stage", default="initial", choices=["initial", "surfel"])
    ap.add_argument("--densify_grad_threshold", type=float, default=0.0002)
    ap.add_argument("--log_every", type=int, default=50)
    args = ap.parse_args()

    from materialrefgs_tpu import config as cfg
    from materialrefgs_tpu.models import gaussian_model as gm
    from materialrefgs_tpu.models.scene import Scene
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.train.trainer import Trainer

    model_params, pipe, opt = cfg.preset_refnerf()
    model_params = dataclasses.replace(model_params, source_path=args.source_path)
    if args.stage == "initial":
        opt = dataclasses.replace(opt, init_until_iter=10**9)
    else:
        opt = dataclasses.replace(
            opt, init_until_iter=0, initial=0, volume_render_until_iter=0,
            indirect_from_iter=10**9, normal_loss_start=0,
        )
    if not args.densify:
        opt = dataclasses.replace(opt, densify_from_iter=10**9)
    opt = dataclasses.replace(
        opt, densify_grad_threshold=args.densify_grad_threshold
    )

    scene = Scene.load(model_params)
    cams = scene.train_cameras[: args.views]
    images = [scene.train_image(i) for i in range(args.views)]
    pcd = scene.info.point_cloud
    rng = np.random.default_rng(0)
    sel = rng.choice(len(pcd.points), args.points, replace=False)
    model = gm.create_from_points(
        pcd.points[sel], pcd.colors[sel], capacity=args.capacity,
        max_sh_degree=model_params.sh_degree, rng=rng,
    )
    trainer = Trainer(
        model, cams, images, opt, pipe,
        cameras_extent=scene.cameras_extent,
        bg_color=(1.0, 1.0, 1.0) if model_params.white_background else (0.0, 0.0, 0.0),
        raster_cfg=RasterizeConfig(pair_capacity=1 << 20),
    )
    t0 = time.time()
    for it in range(0, args.iters, args.log_every):
        n = min(args.log_every, args.iters - it)
        trainer.train(n, start_iter=it + 1, log_every=args.log_every)
        m = trainer.metrics_log[-1]
        print(
            f"it={it+n} psnr={m['psnr']:.2f} loss={m['loss']:.4f} "
            f"n_alive={m['n_alive']} overflow={int(m['overflow'])} "
            f"wall={time.time()-t0:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
