"""Profile the surfel2 (EnvGS indirect) training step on the real chip.

The surfel2 stage dominates full-curriculum wall clock (reference
run_refnerf.sh:31-44 spends 30k of 50k iterations there), so its step cost
sets the training budget. This script times the production step under
ablations to attribute cost:

  full        exact-order tracer + mesh visibility + warp  (production)
  approx      list-order tracer (--approx_tracer_order)
  nomesh      splat-traced visibility instead of mesh
  nowarp      multi-view warp loss off
  surfel      the pre-indirect deferred-shading step (for comparison)

Usage: python scripts/profile_surfel2.py -s /tmp/shiny_synth [--iters 10]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_trainer(scene, images, opt, pipe, extent, *, pair_capacity, capacity,
                  exact_order, use_mesh, with_warp, seed=3407, start_ply=None):
    from materialrefgs_tpu.models import gaussian_io, gaussian_model as gm
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.ops.tracer.api import TracerConfig
    from materialrefgs_tpu.train.trainer import Trainer

    rng = np.random.default_rng(seed)
    if start_ply:
        # Warm start from a trained PLY: realistic geometry => realistic
        # reflected-ray coherence (an untrained cloud overflows the tracer
        # ~50x and is NOT representative of in-curriculum step cost).
        model, _, _ = gaussian_io.load_ply(
            os.path.join(start_ply, "point_cloud.ply"), capacity=capacity
        )
    else:
        pcd = scene.info.point_cloud
        if len(pcd.points) > capacity // 4:
            sel = rng.choice(len(pcd.points), capacity // 4, replace=False)
            pcd = pcd._replace(points=pcd.points[sel], colors=pcd.colors[sel])
        model = gm.create_from_points(
            pcd.points, pcd.colors, capacity=capacity, rng=rng,
            init_refl=opt.init_refl_value,
            init_roughness=opt.init_roughness_value,
        )
    return Trainer(
        model, scene.train_cameras, images, opt, pipe,
        cameras_extent=extent, bg_color=(1.0, 1.0, 1.0),
        raster_cfg=RasterizeConfig(pair_capacity=pair_capacity),
        seed=seed, nearest_ids=scene.nearest_ids, with_warp=with_warp,
        tracer_cfg=TracerConfig(pair_capacity=pair_capacity,
                                cluster_pair_capacity=pair_capacity >> 7,
                                mesh_cull_cap=256,
                                exact_order=exact_order),
        use_mesh_visibility=use_mesh,
    )


def time_variant(name, trainer, start_iter, iters):
    import jax

    t0 = time.time()
    trainer.train(2, start_iter=start_iter, log_every=10**9)
    jax.block_until_ready(trainer.state.model.params)
    compile_s = time.time() - t0
    t0 = time.time()
    trainer.train(iters, start_iter=start_iter + 2, log_every=10**9)
    jax.block_until_ready(trainer.state.model.params)
    per_it = (time.time() - t0) / iters
    print(f"[{name:8s}] {per_it*1e3:8.1f} ms/it   (first-2-iters incl. "
          f"compile+mesh: {compile_s:.1f} s)", flush=True)
    return per_it


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source_path", default="/tmp/shiny_synth")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--capacity", type=int, default=1 << 18)
    ap.add_argument("--pair_capacity", type=int, default=1 << 20)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "approx", "nomesh", "nowarp", "surfel"],
                    help="full/approx/nomesh/nowarp/surfel/warp (warp = "
                         "past the warp gate)")
    ap.add_argument("--start_ply", default=None,
                    help="point_cloud/iteration_N dir for a realistic warm "
                         "start (strongly recommended)")
    args = ap.parse_args()

    from materialrefgs_tpu import config as cfg
    from materialrefgs_tpu.models.scene import Scene

    model_params, pipe, opt = cfg.preset_refnerf()
    opt = cfg.scale_schedule(opt, 0.5)  # surfel2 from 10k
    model_params = dataclasses.replace(model_params, source_path=args.source_path)
    scene = Scene.load(model_params)
    images = [scene.train_image(i) for i in range(len(scene.train_cameras))]
    print(f"{len(images)} cams @ {images[0].shape[:2]}, "
          f"capacity {args.capacity}, pairs {args.pair_capacity}", flush=True)

    start = opt.indirect_from_iter + 7  # surfel2; +7 avoids densify/reset marks
    results = {}
    for v in args.variants:
        kw = dict(exact_order=True, use_mesh=True, with_warp=True)
        s = start
        if v == "warp":
            s = max(start, opt.multi_view_weight_from_iter + 7)
        if v == "approx":
            kw["exact_order"] = False
        elif v == "nomesh":
            kw["use_mesh"] = False
        elif v == "nowarp":
            kw["with_warp"] = False
        elif v == "surfel":
            s = opt.init_until_iter + 7
        tr = build_trainer(scene, images, opt, pipe, scene.cameras_extent,
                           pair_capacity=args.pair_capacity,
                           capacity=args.capacity, start_ply=args.start_ply,
                           **kw)
        # Freeze capacities for stable timing: escalation would recompile
        # mid-measurement (graceful truncation keeps renders sane instead).
        tr.MAX_TRACER_PAIR_CAPACITY = tr.tracer_cfg.pair_capacity
        tr.MAX_PAIR_CAPACITY = args.pair_capacity
        tr.MAX_MESH_CULL_CAP = tr.tracer_cfg.mesh_cull_cap
        results[v] = time_variant(v, tr, s, args.iters)
        del tr
    print({k: round(v * 1e3, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
