"""A/B the splat-traced soft-visibility ray offset against mesh visibility.

VERDICT r3 item 7: `trace_visibility` pushes reflected-ray origins 3e-2
along the ray to escape the ORIGINATING surfel (we trace the splat cloud),
while the reference pushes 1e-3 against a BVH mesh
(envgs_renderer.py:718-724) that cannot self-occlude at that scale. This
script characterizes the bias on a TRAINED model: it renders the surfel
pass on test views, computes mesh-traced visibility (the production path /
reference contract) and splat-traced visibility at several offsets, and
reports per-offset agreement. Small offsets self-hit (vis ~ 0 everywhere
-> large disagreement); too-large offsets jump over thin occluders.

Usage:
  python scripts/ab_visibility_offset.py -m runs/flagship_r4 -s /tmp/shiny_synth
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("--preset", default="refnerf")
    ap.add_argument("--n_views", type=int, default=4)
    ap.add_argument("--offsets", type=float, nargs="+",
                    default=[1e-3, 3e-3, 1e-2, 3e-2, 1e-1])
    ap.add_argument("--pair_capacity", type=int, default=1 << 21)
    ap.add_argument("--out", default=None,
                    help="JSON output path (default <model_path>/ab_visibility.json)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from materialrefgs_tpu import config as cfg
    from materialrefgs_tpu.models import gaussian_io
    from materialrefgs_tpu.models.env_light import EnvLightMips
    from materialrefgs_tpu.models.scene import Scene
    from materialrefgs_tpu.ops import mesh_tracer as mt
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.ops.tracer.api import TracerConfig
    from materialrefgs_tpu.render import envgs
    from materialrefgs_tpu.render.renderers import (
        RenderOptions, mesh_visibility_map, render_surfel,
    )
    from materialrefgs_tpu.train.mesh_extract import read_mesh_ply

    preset = {"refnerf": cfg.preset_refnerf, "refreal": cfg.preset_refreal,
              "glossy": cfg.preset_glossy}[args.preset]
    model_params, pipe, opt = preset()
    model_params = dataclasses.replace(
        model_params, source_path=args.source_path, model_path=args.model_path
    )
    scene = Scene.load(model_params)
    cams = scene.test_cameras or scene.train_cameras
    cams = cams[: args.n_views]

    pc_dir = os.path.join(args.model_path, "point_cloud")
    it = sorted(int(d.split("_")[1]) for d in os.listdir(pc_dir))[-1]
    ply = os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply")
    model, env1, _ = gaussian_io.load_ply(ply, max_sh_degree=model_params.sh_degree)
    print(f"model: {ply} ({int(model.n_alive)} alive)")

    mesh_dir = os.path.join(args.model_path, "meshes")
    plys = sorted(p for p in os.listdir(mesh_dir) if p.endswith(".ply"))
    verts, faces = read_mesh_ply(os.path.join(mesh_dir, plys[-1]))
    mesh = mt.build_mesh(verts, faces)
    print(f"mesh: {plys[-1]} ({len(faces)} tris)")

    mips = EnvLightMips.build_jit(
        env1,
        min_roughness=model_params.envmap_min_roughness,
        max_roughness=model_params.envmap_max_roughness,
    )
    opts = RenderOptions(
        srgb=opt.srgb, unbiased_depth=pipe.unbiased_depth,
        use_asg=pipe.use_asg, depth_ratio=pipe.depth_ratio,
        raster=RasterizeConfig(pair_capacity=args.pair_capacity),
    )
    tracer_cfg = TracerConfig(
        pair_capacity=args.pair_capacity,
        cluster_pair_capacity=args.pair_capacity >> 7,
        mesh_cull_cap=512,
    )

    @jax.jit
    def surf_pass(cam):
        out = render_surfel(model, cam, jnp.ones(3), mips, opts=opts)
        alpha = out["rend_alpha"]
        normal = out["rend_normal"] / jnp.maximum(alpha, 1e-6)
        return normal, out["surf_depth"], alpha

    def vis_pair(cam, normal, depth, alpha, offset):
        active = envgs.bundle_alpha_mask(alpha, cam.height, cam.width)
        v_splat, _ = envgs.trace_visibility(
            model, cam, normal, depth[..., 0], tracer_cfg,
            bundle_mask=active, offset=offset,
        )
        return v_splat

    rows = {f"{o:g}": [] for o in args.offsets}
    vsplat_jit = jax.jit(vis_pair, static_argnames=("offset",))
    for ci, cam in enumerate(cams):
        normal, depth, alpha = surf_pass(cam)
        v_mesh, _ = jax.jit(
            lambda c, n, d, a: mesh_visibility_map(
                mesh, c, n, d, a, cull_cap=tracer_cfg.mesh_cull_cap,
                with_dropped=True)
        )(cam, normal, depth, alpha)
        fg = np.asarray(alpha[..., 0]) > 0.5
        vm = np.asarray(v_mesh[..., 0])
        for off in args.offsets:
            vs = np.asarray(vsplat_jit(cam, normal, depth, alpha, off)[..., 0])
            # Binarize the soft splat visibility at 0.5 like the mesh's hard
            # miss test; report both the thresholded disagreement and MAE.
            dis = float(np.mean((vs[fg] > 0.5) != (vm[fg] > 0.5)))
            mae = float(np.mean(np.abs(vs[fg] - vm[fg])))
            rows[f"{off:g}"].append((dis, mae))
            print(f"view {ci} offset {off:g}: disagree {dis:.4f} mae {mae:.4f}")

    summary = {
        k: {"disagree": float(np.mean([r[0] for r in v])),
            "mae": float(np.mean([r[1] for r in v]))}
        for k, v in rows.items()
    }
    out = args.out or os.path.join(args.model_path, "ab_visibility.json")
    with open(out, "w") as f:
        json.dump({"iteration": it, "n_views": len(cams),
                   "per_offset": summary}, f, indent=1)
    print(json.dumps(summary, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
