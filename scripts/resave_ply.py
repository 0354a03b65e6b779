"""Regenerate the PLY artifacts from an orbax checkpoint (recovery tool).

Replicates scripts/train.py's trainer construction, restores the latest
chkpnt{N}, prints model-health diagnostics (n_alive, opacity stats), and
writes point_cloud/iteration_{N}/point_cloud.ply (+ env PLY).

Usage: python scripts/resave_ply.py -m runs/flagship_r4 -s /tmp/shiny_synth
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
    ap.add_argument("--schedule_scale", type=float, default=0.25)
    ap.add_argument("--capacity", type=int, default=262144)
    args = ap.parse_args()

    import jax.numpy as jnp

    from materialrefgs_tpu import config as cfg
    from materialrefgs_tpu.models import gaussian_io, gaussian_model as gm
    from materialrefgs_tpu.models.scene import Scene
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.train.checkpoint import load_checkpoint
    from materialrefgs_tpu.train.trainer import Trainer

    preset = {"refnerf": cfg.preset_refnerf, "refreal": cfg.preset_refreal,
              "glossy": cfg.preset_glossy}[args.preset]
    model_params, pipe, opt = preset()
    if args.schedule_scale != 1.0:
        opt = cfg.scale_schedule(opt, args.schedule_scale)
    model_params = dataclasses.replace(
        model_params, source_path=args.source_path, model_path=args.model_path
    )
    scene = Scene.load(model_params)
    images = [scene.train_image(0)]  # trainer needs >= 1 image; unused here
    pcd = scene.info.point_cloud
    model = gm.create_from_points(
        pcd.points[:1000], pcd.colors[:1000], capacity=args.capacity,
        max_sh_degree=model_params.sh_degree,
        rng=np.random.default_rng(0),
    )
    trainer = Trainer(
        model, scene.train_cameras[:1], images, opt, pipe,
        cameras_extent=scene.cameras_extent, bg_color=(1.0, 1.0, 1.0),
        raster_cfg=RasterizeConfig(pair_capacity=1 << 16),
    )
    with open(os.path.join(args.model_path, "chkpnt_meta.json")) as f:
        meta = json.load(f)
    if meta.get("has_env_gs"):
        trainer._init_env_gs()
    trainer.state, done = load_checkpoint(trainer.state, args.model_path)
    st = trainer.state
    print(f"restored iteration {done}")
    m = st.model
    op = np.asarray(m.get_opacity[:, 0])
    al = np.asarray(m.alive)
    print(f"n_alive={int(al.sum())} opacity alive min/mean/max="
          f"{op[al].min() if al.any() else float('nan'):.4f}/"
          f"{op[al].mean() if al.any() else float('nan'):.4f}/"
          f"{op[al].max() if al.any() else float('nan'):.4f}")
    if st.env_gs is not None:
        print(f"env n_alive={int(np.asarray(st.env_gs.alive).sum())}")

    out = os.path.join(
        args.model_path, f"point_cloud/iteration_{done}/point_cloud.ply"
    )
    gaussian_io.save_ply(m, out, env1=st.env1, env2=st.env2)
    print(f"wrote {out}")
    if st.env_gs is not None:
        env_out = os.path.join(
            args.model_path, f"point_cloud/iteration_{done}/env_point_cloud.ply"
        )
        gaussian_io.save_ply(st.env_gs, env_out)
        print(f"wrote {env_out}")


if __name__ == "__main__":
    main()
