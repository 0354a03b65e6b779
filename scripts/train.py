"""Training CLI (reference train_refnerf.py / train_refreal.py / train_glossy.py).

Usage:
  python scripts/train.py -s <scene_dir> -m <out_dir> --preset refnerf
  python scripts/train.py -s <scene_dir> -m <out_dir> --preset refreal
  python scripts/train.py -s <scene_dir> -m <out_dir> --preset glossy

The three reference trainers are config presets here (SURVEY §7: "full
three-trainer parity as config presets, not code forks").
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--preset", default="refnerf", choices=["refnerf", "refreal", "glossy"])
    ap.add_argument("-r", "--resolution", type=int, default=None,
                    help="image downscale factor (reference -r)")
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--schedule_scale", type=float, default=1.0,
                    help="uniformly compress/stretch the whole curriculum "
                         "(stage boundaries, loss gates, densify cadences, "
                         "LR horizon) by this factor; applied before "
                         "--iterations and explicit flags")
    ap.add_argument("--capacity", type=int, default=1 << 19)
    ap.add_argument("--pair_capacity", type=int, default=1 << 20)
    ap.add_argument("--tracer_pair_capacity", type=int, default=None,
                    help="splat-tracer pair budget (default: --pair_capacity); "
                         "set high to skip overflow-escalation recompiles in "
                         "the surfel2 stage")
    ap.add_argument("--approx_tracer_order", action="store_true",
                    help="train the env-GS tracer with the faster shared "
                         "list-order compositing instead of per-ray exact "
                         "order (exact is the default; eval always exact)")
    ap.add_argument("--save_iterations", type=int, nargs="+", default=None)
    ap.add_argument("--test_iterations", type=int, nargs="+", default=None)
    ap.add_argument("--metric3d_path", default=None)
    ap.add_argument("--mask_dir", default=None,
                    help="dir of foreground-mask PNGs (mask = last channel "
                         "> 128); auto-resolved per preset when omitted "
                         "(glossy: rgb/, refnerf: train/, train_glossy.py:101)")
    ap.add_argument("--seed", type=int, default=3407)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--checkpoint_iterations", type=int, nargs="+", default=None)
    ap.add_argument("--checkpoint_every", type=int, default=0,
                    help="save a full resume checkpoint every N iterations")
    ap.add_argument("--test_every", type=int, default=0,
                    help="evaluate test-set PSNR every N iters (psnr.json)")
    ap.add_argument("--start_checkpoint", default=None,
                    help="model dir containing chkpnt{N} to resume from "
                         "(reference train_refnerf.py:1036-1046)")
    ap.add_argument("--start_ply", default=None,
                    help="point_cloud/iteration_N dir: initialize model + "
                         "env maps from saved PLY artifacts (fresh optimizer "
                         "state) and continue from --start_iter")
    ap.add_argument("--start_iter", type=int, default=0,
                    help="iteration to resume the curriculum at with "
                         "--start_ply")
    ap.add_argument("--ref_score_path", default=None,
                    help="dir of precomputed reflection-score PNGs "
                         "(train_refreal.py:177-185); 'auto' mines them "
                         "in-process at ref_score_start_iter")
    ap.add_argument("--no_mesh_visibility", action="store_true",
                    help="disable mesh-traced specular visibility past "
                         "indirect_from_iter (falls back to splat-traced "
                         "soft visibility)")
    ap.add_argument("--mesh_every", type=int, default=None,
                    help="TSDF mesh re-extraction interval past "
                         "indirect_from_iter (train_refnerf.py:1459); "
                         "default 2000 x schedule_scale")
    ap.add_argument("--dp", type=int, default=0,
                    help="multi-chip camera-batch data parallelism: run the "
                         "curriculum step on a ('dp',) mesh of N devices, one "
                         "camera per chip, gradients pmean'd over ICI (0 = "
                         "single-chip Trainer)")
    ap.add_argument("--deadline_min", type=float, default=0,
                    help="wall-clock budget in minutes: at the first mark "
                         "past the deadline, save checkpoint+PLY+logs and "
                         "exit cleanly at the iteration boundary (never "
                         "kill a TPU run mid-step — platform trap 8)")
    ap.add_argument("--detect_anomaly", action="store_true",
                    help="debug: check loss/gradients for nonfinite values "
                         "every step and abort with the offending parameter "
                         "groups named (reference train_refnerf.py:1832)")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform (cpu for smoke runs; the "
                         "axon TPU plugin otherwise wins even over "
                         "JAX_PLATFORMS)")

    from materialrefgs_tpu import config as cfg

    # Reflection CLI: every Model/Pipeline/Optimization param is a flag
    # (reference ParamGroup, arguments/__init__.py:20-51); unset flags keep
    # the preset's values.
    cfg.add_param_flags(ap)
    args = ap.parse_args()

    if args.device:
        import jax

        jax.config.update(
            "jax_platforms", {"cpu": "cpu", "tpu": "axon"}[args.device]
        )
    from materialrefgs_tpu.models import gaussian_io, gaussian_model as gm
    from materialrefgs_tpu.models.scene import Scene
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.ops.tracer.api import TracerConfig
    from materialrefgs_tpu.train.trainer import Trainer

    preset = {
        "refnerf": cfg.preset_refnerf,
        "refreal": cfg.preset_refreal,
        "glossy": cfg.preset_glossy,
    }[args.preset]
    model_params, pipe, opt = preset()
    if args.schedule_scale != 1.0:
        opt = cfg.scale_schedule(opt, args.schedule_scale)
        print(f"[schedule] curriculum scaled x{args.schedule_scale}: "
              f"iterations={opt.iterations}, indirect_from={opt.indirect_from_iter}, "
              f"densify_until={opt.densify_until_iter}")
    if args.mesh_every is None:
        # The mesh cadence is a curriculum literal too (train_refnerf.py:1459
        # `% 2000`); round-4 weak #7: every absolute cadence must compress
        # with the schedule or it fires at the wrong stage position.
        args.mesh_every = max(1, round(2000 * args.schedule_scale))
    model_params, pipe, opt = cfg.apply_param_flags(args, model_params, pipe, opt)
    model_params = dataclasses.replace(
        model_params, source_path=args.source_path, model_path=args.model_path
    )
    if args.iterations:
        opt = dataclasses.replace(opt, iterations=args.iterations)
    if args.resolution:
        model_params = dataclasses.replace(model_params, resolution=args.resolution)

    cfg.dump_config(
        args.model_path, model_params, pipe, opt,
        extra={"preset": args.preset, "capacity": args.capacity,
               "pair_capacity": args.pair_capacity, "seed": args.seed},
    )

    # Source self-backup for reproducibility (the reference copies its
    # renderer/scene/utils trees into the run dir, train_refnerf.py:1655-1665).
    import shutil

    src_bak = os.path.join(args.model_path, "code_backup")
    if not os.path.exists(src_bak):
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        shutil.copytree(
            os.path.join(pkg_root, "materialrefgs_tpu"),
            os.path.join(src_bak, "materialrefgs_tpu"),
            ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.npy"),
        )
        shutil.copy2(os.path.abspath(__file__), src_bak)

    print(f"Loading scene from {args.source_path} ...")
    scene = Scene.load(model_params)
    n_train = len(scene.train_cameras)
    print(f"{n_train} train cameras, extent {scene.cameras_extent:.2f}")

    images = [scene.train_image(i) for i in range(n_train)]
    H, W = images[0].shape[:2]

    # Foreground masks (mask-entropy loss + mono-normal masking). Mirrors the
    # reference get_mask_dir (train_glossy.py:101-134): the glossy preset's
    # nero2blender layout keeps alpha in `rgb/`, synthetic blender in
    # `train/`; mask = last channel > 128.
    masks = None
    mask_dir = args.mask_dir
    if mask_dir is None:
        auto = {"glossy": "rgb", "refnerf": "train", "refreal": "mask"}[args.preset]
        cand = os.path.join(args.source_path, auto)
        mask_dir = cand if os.path.isdir(cand) else None
    if mask_dir:
        from PIL import Image

        masks = []
        for ci in scene.info.train_cameras:
            p = os.path.join(mask_dir, ci.image_name + ".png")
            if not os.path.exists(p):
                masks = None
                break
            img = Image.open(p)
            if img.size != (W, H):
                img = img.resize((W, H), Image.NEAREST)
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = arr[..., None]
            masks.append((arr[..., -1] > 128).astype(np.float32))
        if masks is not None:
            print(f"Loaded {len(masks)} foreground masks from {mask_dir}")

    # Metric3D mono-normal priors. Layout differs per preset
    # (train_glossy.py:62 `{scan}/normal` vs train_refnerf.py:60
    # `{scan}_train/normal`); a flat dir of `{image_name}.png` also works.
    priors = None
    if args.metric3d_path and os.path.isdir(args.metric3d_path):
        from PIL import Image

        scan = os.path.basename(os.path.normpath(args.source_path))
        suffix = "" if args.preset == "glossy" else "_train"
        prior_dirs = [
            os.path.join(args.metric3d_path, scan + suffix, "normal"),
            os.path.join(args.metric3d_path, scan, "normal"),
            args.metric3d_path,
        ]
        prior_rt = next((d for d in prior_dirs if os.path.isdir(d)), None)
        priors = []
        for ci in scene.info.train_cameras:
            p = os.path.join(prior_rt, ci.image_name + ".png") if prior_rt else ""
            if p and os.path.exists(p):
                arr = np.asarray(Image.open(p), np.float32) / 255.0 * 2 - 1
                priors.append(arr[..., :3])
            else:
                priors = None
                break

    ref_score_masks = None
    if args.ref_score_path and args.ref_score_path != "auto":
        # Precomputed reflection-score PNGs (train_refreal.py:177-185):
        # mask = last channel > 128.
        from PIL import Image

        ref_score_masks = []
        for ci in scene.info.train_cameras:
            p = os.path.join(args.ref_score_path, ci.image_name + ".png")
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"--ref_score_path given but {p} is missing"
                )
            arr = np.asarray(Image.open(p))
            ref_score_masks.append((arr[..., -1] > 128).astype(np.float32))

    pcd = scene.info.point_cloud
    if len(pcd.points) > args.capacity:
        # Keep room for densification: subsample the seed cloud to half cap.
        sel = np.random.default_rng(args.seed).choice(
            len(pcd.points), args.capacity // 2, replace=False
        )
        pcd = pcd._replace(points=pcd.points[sel], colors=pcd.colors[sel])
        print(f"Subsampled seed cloud {len(sel)}/{args.capacity} (capacity)")
    start_env = None
    if args.start_ply:
        # Warm-start from PLY artifacts (fresh optimizer state): lets a run
        # continue across stage boundaries without an orbax checkpoint.
        model, e1, e2 = gaussian_io.load_ply(
            os.path.join(args.start_ply, "point_cloud.ply"),
            capacity=args.capacity, max_sh_degree=model_params.sh_degree,
        )
        start_env = (e1, e2)
        print(f"Warm-started {int(model.n_alive)} gaussians from {args.start_ply}")
    else:
        model = gm.create_from_points(
            pcd.points, pcd.colors, capacity=args.capacity,
            max_sh_degree=model_params.sh_degree,
            rng=np.random.default_rng(args.seed),
            init_refl=opt.init_refl_value,
            init_roughness=opt.init_roughness_value,
        )
        print(f"Initialized {len(pcd.points)} gaussians (capacity {args.capacity})")

    bg = (1.0, 1.0, 1.0) if model_params.white_background else (0.0, 0.0, 0.0)
    trainer_cls = Trainer
    trainer_kw = {}
    if args.dp:
        import jax
        from jax.sharding import Mesh

        from materialrefgs_tpu.parallel.dp_trainer import DPTrainer

        devs = jax.devices()
        if len(devs) < args.dp:
            raise SystemExit(
                f"--dp {args.dp} but only {len(devs)} devices visible "
                "(CPU sim: XLA_FLAGS=--xla_force_host_platform_device_count=N "
                "+ --device cpu)"
            )
        trainer_cls = DPTrainer
        trainer_kw["mesh"] = Mesh(np.array(devs[: args.dp]), ("dp",))
        print(f"[dp] camera-batch DP over {args.dp} devices "
              f"({devs[0].platform})")
    trainer = trainer_cls(
        model,
        scene.train_cameras,
        images,
        opt,
        pipe,
        cameras_extent=scene.cameras_extent,
        bg_color=bg,
        raster_cfg=RasterizeConfig(pair_capacity=args.pair_capacity,
                                   interpret=(args.device == "cpu")),
        seed=args.seed,
        masks=masks,
        normal_priors=priors,
        ref_score_masks=ref_score_masks,
        nearest_ids=scene.nearest_ids,
        with_warp=(opt.multi_view_ncc_weight > 0),
        tracer_cfg=TracerConfig(pair_capacity=args.tracer_pair_capacity
                                or args.pair_capacity,
                                cluster_pair_capacity=(
                                    args.tracer_pair_capacity
                                    or args.pair_capacity) >> 7,
                                mesh_cull_cap=512,
                                interpret=(args.device == "cpu"),
                                exact_order=not args.approx_tracer_order),
        mesh_dir=os.path.join(args.model_path, "meshes"),
        mesh_every=args.mesh_every,
        use_mesh_visibility=not args.no_mesh_visibility,
        virtual_cam_trans_noise=model_params.multi_view_max_dis,
        virtual_cam_deg_noise=model_params.multi_view_max_angle,
        envmap_res=model_params.envmap_max_res,
        envmap_min_roughness=model_params.envmap_min_roughness,
        envmap_max_roughness=model_params.envmap_max_roughness,
        detect_anomaly=args.detect_anomaly,
        **trainer_kw,
    )

    if args.tracer_pair_capacity:
        # An explicit tracer budget is the operator's chip-budget statement:
        # pin escalation to it (graceful truncation degrades the far tail
        # instead; ops/segments.py).
        trainer.MAX_TRACER_PAIR_CAPACITY = args.tracer_pair_capacity

    if getattr(trainer, "lpips_disabled", False):
        # Durable degradation record: the console banner alone is not enough
        # for a long headless run — re-dump cfg_args so the persisted config
        # reflects that the perceptual loss did NOT run.
        cfg.dump_config(
            args.model_path, model_params, pipe, trainer.opt,
            extra={"preset": args.preset, "capacity": args.capacity,
                   "pair_capacity": args.pair_capacity, "seed": args.seed,
                   "lpips_disabled": True},
        )

    os.makedirs(args.model_path, exist_ok=True)
    from materialrefgs_tpu.utils.logging_utils import TrainLogger

    logger = TrainLogger(args.model_path)
    save_iters = args.save_iterations or [opt.iterations]
    ckpt_iters = set(args.checkpoint_iterations or [])
    if args.checkpoint_every:
        ckpt_iters |= set(
            range(args.checkpoint_every, opt.iterations + 1, args.checkpoint_every)
        )
    test_every = args.test_every
    test_marks = set(args.test_iterations or [])
    marks = set(save_iters) | ckpt_iters | test_marks | {opt.iterations}
    if test_every:
        test_marks |= set(range(test_every, opt.iterations + 1, test_every))
        marks |= test_marks
    # Marks beyond the run length are never reached (reference semantics);
    # without this a stray --checkpoint_iterations would extend training.
    marks = {m for m in marks if m <= opt.iterations}
    done = 0
    if args.start_checkpoint:
        # Resume (reference train_refnerf.py:1036-1046: restore model +
        # optimizer + env maps; env-GS branch rebuilt to match the pytree).
        from materialrefgs_tpu.train.checkpoint import load_checkpoint

        with open(os.path.join(args.start_checkpoint, "chkpnt_meta.json")) as f:
            meta = json.load(f)
        if meta.get("has_env_gs"):
            trainer._init_env_gs()
        trainer.state, done = load_checkpoint(trainer.state, args.start_checkpoint)
        print(f"Resumed from {args.start_checkpoint} at iteration {done}")
        marks = {m for m in marks if m > done} | {opt.iterations}
    elif args.start_ply:
        e1, e2 = start_env
        st = trainer.state
        if e1 is not None:
            st = st.replace(env1=e1)
        if e2 is not None:
            st = st.replace(env2=e2)
        import jax.numpy as jnp

        st = st.replace(step=jnp.int32(args.start_iter))
        trainer.state = st
        env_ply = os.path.join(args.start_ply, "env_point_cloud.ply")
        if os.path.exists(env_ply):
            from materialrefgs_tpu.train.trainer import make_optimizer

            env_gs, _, _ = gaussian_io.load_ply(
                env_ply, capacity=args.capacity,
                max_sh_degree=model_params.sh_degree,
            )
            trainer.state = trainer.state.replace(
                env_gs=env_gs, env_gs_opt_state=make_optimizer().init(env_gs.params)
            )
        done = args.start_iter
        marks = {m for m in marks if m > done} | {opt.iterations}

    if args.ref_score_path == "auto":
        rs_iter = opt.ref_score_start_iter
        if done < rs_iter <= opt.iterations:
            marks |= {rs_iter}
        elif done >= rs_iter:
            # Resumed past the mining point: masks are not checkpointed, so
            # mine now or the resumed run would silently train without the
            # ref-score supervision an uninterrupted run has.
            print(f"[resume] mining reflection scores (past {rs_iter}) ...")
            trainer.mine_ref_scores()

    t0 = time.time()
    deadline_hit = False
    for target in sorted(marks):
        n = target - done
        if n <= 0:
            continue
        if args.deadline_min and (time.time() - t0) / 60 > args.deadline_min:
            # Clean stop at an iteration boundary: checkpoint + PLY below.
            print(
                f"[deadline] {args.deadline_min:.0f} min budget exhausted at "
                f"iteration {done}/{opt.iterations}; saving and exiting"
            )
            deadline_hit = True
            from materialrefgs_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(trainer.state, done, args.model_path)
            target = done  # fall through to the PLY/log save block
            out = os.path.join(
                args.model_path,
                f"point_cloud/iteration_{done}/point_cloud.ply",
            )
            gaussian_io.save_ply(
                trainer.state.model, out,
                env1=trainer.state.env1, env2=trainer.state.env2,
            )
            if trainer.state.env_gs is not None:
                gaussian_io.save_ply(
                    trainer.state.env_gs,
                    os.path.join(
                        args.model_path,
                        f"point_cloud/iteration_{done}/env_point_cloud.ply",
                    ),
                )
            with open(os.path.join(args.model_path, "train_log.json"), "w") as f:
                json.dump(trainer.metrics_log, f)
            break
        trainer.train(n, start_iter=done + 1, log_every=args.log_every)
        done = target
        if args.ref_score_path == "auto" and target == opt.ref_score_start_iter:
            print(f"[{target}] mining reflection scores ...")
            trainer.mine_ref_scores()
        if trainer.metrics_log:
            logger.scalars(target, trainer.metrics_log[-1])
            # Flush the scalar log at every mark: an interrupted run keeps
            # its curve (an early kill otherwise loses everything, since
            # the full dump below only happens at save marks).
            with open(os.path.join(args.model_path, "train_log.json"), "w") as f:
                json.dump(trainer.metrics_log, f)
        if target in test_marks and scene.test_cameras:
            from materialrefgs_tpu.evaluate import render_set

            test_imgs = [scene.test_image(i) for i in range(len(scene.test_cameras))]
            from materialrefgs_tpu.models.env_light import EnvLightMips
            from materialrefgs_tpu.render.renderers import RenderOptions

            from materialrefgs_tpu.train.trainer import select_stage

            mips = EnvLightMips.build_jit(
                trainer.state.env1,
                min_roughness=model_params.envmap_min_roughness,
                max_roughness=model_params.envmap_max_roughness,
            )
            stage = select_stage(target, opt)
            m = render_set(
                args.model_path, "test_eval", scene.test_cameras, test_imgs,
                trainer.state.model, mips,
                env_model=trainer.state.env_gs if stage == "surfel2" else None,
                opts=RenderOptions(
                    unbiased_depth=pipe.unbiased_depth, srgb=opt.srgb,
                    use_asg=pipe.use_asg, depth_ratio=pipe.depth_ratio,
                    raster=RasterizeConfig(pair_capacity=args.pair_capacity,
                                           interpret=(args.device == "cpu")),
                ),
                tracer_cfg=dataclasses.replace(
                    trainer.tracer_cfg, exact_order=True
                ),
                dump_maps=False,
                bg_color=bg,
                stage="initial" if stage == "initial" else "surfel",
                mesh=trainer.mesh if stage == "surfel2" else None,
            )
            logger.test_psnr(target, m["psnr"])
            print(f"[{target}] test psnr {m['psnr']:.2f}")
        if target in ckpt_iters:
            from materialrefgs_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(trainer.state, target, args.model_path)
        if target not in set(save_iters) and target != opt.iterations:
            continue
        out = os.path.join(args.model_path, f"point_cloud/iteration_{target}/point_cloud.ply")
        gaussian_io.save_ply(
            trainer.state.model, out, env1=trainer.state.env1, env2=trainer.state.env2
        )
        if trainer.state.env_gs is not None:
            gaussian_io.save_ply(
                trainer.state.env_gs,
                os.path.join(args.model_path, f"point_cloud/iteration_{target}/env_point_cloud.ply"),
            )
        with open(os.path.join(args.model_path, "train_log.json"), "w") as f:
            json.dump(trainer.metrics_log, f)
        last = trainer.metrics_log[-1] if trainer.metrics_log else {}
        print(
            f"[{target}] saved; psnr={last.get('psnr', float('nan')):.2f} "
            f"n_alive={last.get('n_alive', 0)} wall={time.time()-t0:.0f}s"
        )


if __name__ == "__main__":
    main()
