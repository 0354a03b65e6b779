"""Evaluation CLI (reference eval.py): load a trained model, render the
train/test sets, write metrics + per-map PNGs.

Usage: python scripts/eval.py -m output/helmet -s /data/refnerf/helmet
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_gt_normals(source_path, image_names, hw):
    """GT normal maps for the test split, when the dataset ships them
    (Glossy Synthetic via nero2blender: `normal/{name}.png`; Shiny Blender:
    `test/{name}_normal.png`). Returns (normals, masks) or (None, None).
    PNGs decode as n = 2*rgb - 1; the alpha channel (if any) is the
    foreground mask."""
    from PIL import Image

    layouts = [
        lambda n: os.path.join(source_path, "normal", n + ".png"),
        lambda n: os.path.join(source_path, "test", n + "_normal.png"),
        lambda n: os.path.join(source_path, n + "_normal.png"),
    ]
    for layout in layouts:
        if not all(os.path.exists(layout(n)) for n in image_names):
            continue
        normals, masks = [], []
        for n in image_names:
            img = Image.open(layout(n))
            if img.size != (hw[1], hw[0]):
                img = img.resize((hw[1], hw[0]), Image.BILINEAR)
            arr = np.asarray(img, np.float32) / 255.0
            normals.append(arr[..., :3] * 2.0 - 1.0)
            masks.append(
                (arr[..., 3] > 0.5).astype(np.float32)
                if arr.shape[-1] == 4
                else np.ones(arr.shape[:2], np.float32)
            )
        return normals, masks
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--preset", default="refnerf", choices=["refnerf", "refreal", "glossy"])
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_test", action="store_true")
    ap.add_argument("--relight", default=None, metavar="HDR",
                    help="render under a NEW environment: load this HDR as "
                         "the env light instead of the trained cubemap "
                         "(reference load_ply(relight=True), "
                         "gaussian_model.py:813-815)")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform (cpu for smoke runs)")
    ap.add_argument("--export_material_mesh", action="store_true",
                    help="write fuse_post_material.ply: the extracted mesh "
                         "with per-vertex rgb/normal/diffuse/albedo/"
                         "metallic/roughness (mesh_utils.py:255)")
    args = ap.parse_args()

    if args.device:
        import jax

        jax.config.update(
            "jax_platforms", {"cpu": "cpu", "tpu": "axon"}[args.device]
        )

    from materialrefgs_tpu import config as cfg
    from materialrefgs_tpu.evaluate import render_set, write_metrics
    from materialrefgs_tpu.models import gaussian_io
    from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
    from materialrefgs_tpu.models.scene import Scene
    from materialrefgs_tpu.render.renderers import RenderOptions
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.ops.tracer.api import TracerConfig

    # Prefer the training run's dumped config (get_combined_args semantics,
    # arguments/__init__.py:254-274) so non-default runs evaluate correctly;
    # --preset is the fallback for runs predating cfg_args.json.
    extra_cfg = {}
    loaded = cfg.load_config(args.model_path)
    if loaded is not None:
        model_params, pipe, opt, extra_cfg = loaded
        print(f"Using {os.path.join(args.model_path, 'cfg_args.json')}")
    else:
        preset = {
            "refnerf": cfg.preset_refnerf,
            "refreal": cfg.preset_refreal,
            "glossy": cfg.preset_glossy,
        }[args.preset]
        model_params, pipe, opt = preset()
    model_params = dataclasses.replace(
        model_params, source_path=args.source_path, model_path=args.model_path
    )
    scene = Scene.load(model_params)

    pc_dir = os.path.join(args.model_path, "point_cloud")
    it = args.iteration
    if it < 0:
        iters = [int(d.split("_")[-1]) for d in os.listdir(pc_dir) if d.startswith("iteration_")]
        it = max(iters)
    ply = os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply")
    print(f"Loading {ply}")
    model, env1, env2 = gaussian_io.load_ply(ply, max_sh_degree=model_params.sh_degree)
    if args.relight:
        from materialrefgs_tpu.models.env_light import load_envlight_from_hdr

        env1 = load_envlight_from_hdr(args.relight, res=model_params.envmap_max_res)
        print(f"Relighting with {args.relight}")
    env1 = env1 or EnvLightParams.create(model_params.envmap_max_res)
    mips = EnvLightMips.build_jit(
        env1,
        min_roughness=model_params.envmap_min_roughness,
        max_roughness=model_params.envmap_max_roughness,
    )

    # Trained environment map dumps (reference eval.py:129-139: latlong
    # grids of env1/env2 next to metric.txt).
    import jax.nn as jnn

    from materialrefgs_tpu.evaluate import save_png
    from materialrefgs_tpu.ops.cubemap import cubemap_to_latlong

    for name, env in (("env1", env1), ("env2", env2)):
        if env is None:
            continue
        img = np.asarray(jnn.sigmoid(cubemap_to_latlong(env.base, 512, 1024)))
        save_png(os.path.join(args.model_path, f"{name}.png"), np.clip(img, 0, 1))

    env_ply = os.path.join(pc_dir, f"iteration_{it}", "env_point_cloud.ply")
    env_model = None
    if os.path.exists(env_ply):
        env_model, _, _ = gaussian_io.load_ply(env_ply, max_sh_degree=model_params.sh_degree)

    # Mesh-traced specular visibility: use the newest TSDF mesh the trainer
    # dumped (reference eval.py loads test_{N}.ply and rebuilds the BVH).
    mesh = None
    mesh_dir = os.path.join(args.model_path, "meshes")
    if env_model is not None and os.path.isdir(mesh_dir):
        plys = sorted(p for p in os.listdir(mesh_dir) if p.endswith(".ply"))
        if plys:
            from materialrefgs_tpu.ops import mesh_tracer as mt
            from materialrefgs_tpu.train.mesh_extract import read_mesh_ply

            verts, faces = read_mesh_ply(os.path.join(mesh_dir, plys[-1]))
            mesh = mt.build_mesh(verts, faces)
            print(f"Mesh visibility: {plys[-1]} ({len(faces)} tris)")

            if args.export_material_mesh:
                from materialrefgs_tpu.ops.mesh_tracer import bake_vertex_attrs
                from materialrefgs_tpu.train.mesh_material import (
                    write_material_mesh_ply,
                )

                attrs = bake_vertex_attrs(model, verts)
                out = os.path.join(args.model_path, "fuse_post_material.ply")
                write_material_mesh_ply(out, verts, faces, attrs)
                print(f"Material mesh: {out} ({len(verts)} verts)")

    # Carry the run's full pipeline settings: use_asg picks the indirect
    # representation, depth_ratio the 2DGS depth blend, and the dumped
    # pair_capacity prevents silent pair overflow on large trained scenes.
    opts = RenderOptions(
        srgb=opt.srgb,
        unbiased_depth=pipe.unbiased_depth,
        use_asg=pipe.use_asg,
        depth_ratio=pipe.depth_ratio,
        raster=RasterizeConfig(
            pair_capacity=int(extra_cfg.get("pair_capacity", 1 << 20)),
            interpret=(args.device == "cpu"),
        ),
    )
    # Mid-curriculum checkpoints must evaluate on the path they trained
    # with (select_render_method): initial / volume (env2) / deferred.
    from materialrefgs_tpu.train.trainer import select_stage

    eval_stage = select_stage(it, opt)
    if eval_stage not in ("initial", "volume"):
        eval_stage = "surfel"
    if eval_stage == "volume" and env2 is not None:
        mips = EnvLightMips.build_jit(
            env2,
            min_roughness=model_params.envmap_min_roughness,
            max_roughness=model_params.envmap_max_roughness,
        )
    bg = (1.0, 1.0, 1.0) if model_params.white_background else (0.0, 0.0, 0.0)
    # Final renders use EXACT per-ray within-chunk compositing order for the
    # traced indirect (forward-only; +12 dB vs the training-time sorted-list
    # approximation on dense scenes, tests/test_tracer_image_ab.py).
    tr_cfg = TracerConfig(
        interpret=(args.device == "cpu"),
        exact_order=True,
        pair_capacity=int(extra_cfg.get("pair_capacity", 1 << 19)),
    )
    out_dir = os.path.join(args.model_path, f"eval_{it}")
    if not args.skip_test and scene.test_cameras:
        images = [scene.test_image(i) for i in range(len(scene.test_cameras))]
        test_names = [ci.image_name for ci in scene.info.test_cameras]
        gt_normals, gt_nmasks = load_gt_normals(
            args.source_path, test_names, images[0].shape[:2]
        )
        if gt_normals is not None:
            print(f"GT normals found for {len(gt_normals)} test views (normal MAE on)")
        m = render_set(
            out_dir, "test", scene.test_cameras, images, model, mips, env_model,
            opts, tracer_cfg=tr_cfg, bg_color=bg, mesh=mesh, stage=eval_stage,
            gt_normals=gt_normals, gt_normal_masks=gt_nmasks,
        )
        write_metrics(out_dir, m)
        print("test:", {k: v for k, v in m.items() if k != "per_view_psnr"})
    if not args.skip_train:
        images = [scene.train_image(i) for i in range(len(scene.train_cameras))]
        m = render_set(
            out_dir, "train", scene.train_cameras, images, model, mips, env_model,
            opts, tracer_cfg=tr_cfg, bg_color=bg, mesh=mesh, stage=eval_stage,
        )
        print("train:", {k: v for k, v in m.items() if k != "per_view_psnr"})


if __name__ == "__main__":
    main()
