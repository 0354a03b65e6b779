"""Camera-batch DP over the production train step + DP x TP composition.

Covers parallel/data_parallel.make_dp_production_step (the REAL
trainer.make_train_step under shard_map, gradients pmean'd over 'dp') and
parallel/tile_sharding.dp_tp_render_grads (2D mesh: cameras over dp, tile
rows over tp). Parity anchor: a 1-device DP mesh must reproduce the plain
single-chip step bit-for-bit (pmean over one chip is the identity).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.config import OptimizationParams, PipelineParams
from materialrefgs_tpu.models import gaussian_model as gm
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from materialrefgs_tpu.parallel.data_parallel import (
    make_dp_production_step,
    stack_cameras,
)
from materialrefgs_tpu.parallel.tile_sharding import dp_tp_render_grads
from materialrefgs_tpu.train.trainer import init_train_state, make_train_step

CFG = RasterizeConfig(pair_capacity=1 << 12, interpret=True)
W = H = 32


def _cam(i, n):
    ang = 2 * np.pi * i / n
    eye = np.array([3.0 * np.sin(ang), 0.4, -3.0 * np.cos(ang)])
    return look_at_camera(
        eye, np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.9, 0.9, W, H
    )


def _state(rng, capacity=64):
    pts = rng.normal(size=(48, 3)).astype(np.float32)
    cols = rng.uniform(size=(48, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=capacity)
    return init_train_state(model, OptimizationParams(), envmap_res=16)


def _extra(n, it=5000.0):
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    e = {
        "iteration": jnp.full((n,), it, jnp.float32),
        "lambda_normal_render_depth": jnp.full((n,), 0.05, jnp.float32),
        "normal_gamma": jnp.zeros((n,), jnp.float32),
        "warp_key": keys,
        "bg": jnp.zeros((n, 3), jnp.float32),
    }
    return e


@pytest.mark.core
def test_dp_one_device_matches_plain_step(rng):
    """pmean over a 1-chip mesh is identity: the DP production step must
    reproduce the plain jitted step exactly."""
    opt = OptimizationParams()
    pipe = PipelineParams()
    state = _state(rng)
    state2 = jax.tree_util.tree_map(
        lambda a: a.copy() if hasattr(a, "copy") else a, state
    )
    cam = _cam(0, 1)
    gt = jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32)

    plain = make_train_step(
        "surfel", opt, pipe, 3.0, CFG, envmap_n_samples=4, with_warp=False
    )
    extra_b = _extra(1)
    extra = {k: v[0] for k, v in extra_b.items()}
    s1, m1 = plain(state, cam, gt, extra, cam, gt)

    mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
    dp = make_dp_production_step(
        mesh, "surfel", opt, pipe, 3.0, CFG, envmap_n_samples=4
    )
    cam_b = stack_cameras([cam])
    gt_b = gt[None]
    s2, m2 = dp(state2, cam_b, gt_b, extra_b, cam_b, gt_b, None)

    np.testing.assert_allclose(
        np.asarray(s2.model.params.xyz), np.asarray(s1.model.params.xyz),
        atol=1e-6,
    )
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), atol=1e-6)


def test_dp_production_step_two_devices(rng):
    """2-chip DP with the warp loss on: finite loss, replicated params
    advance, densification stats accumulate for either camera's splats."""
    opt = OptimizationParams()
    state = _state(rng)
    xyz0 = np.asarray(state.model.params.xyz).copy()
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    dp = make_dp_production_step(
        mesh, "surfel", opt, PipelineParams(), 3.0, CFG,
        envmap_n_samples=4, with_warp=True,
    )
    cams = [_cam(i, 2) for i in range(2)]
    cam_b = stack_cameras(cams)
    # Nearest views must be DISTINCT cameras (the trainer's nearest_ids never
    # include self; a self-warp is a degenerate zero-baseline homography).
    ncam_b = stack_cameras([_cam(i + 0.3, 2) for i in range(2)])
    gt_b = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
    ngt_b = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
    extra_b = _extra(2, it=float(opt.multi_view_weight_from_iter + 100))

    state, metrics = dp(state, cam_b, gt_b, extra_b, ncam_b, ngt_b, None)
    assert np.isfinite(float(metrics["loss"]))
    xyz1 = np.asarray(state.model.params.xyz)
    assert np.all(np.isfinite(xyz1))
    assert not np.allclose(xyz1[: state.model.n_alive], xyz0[: state.model.n_alive])
    assert np.asarray(state.model.max_radii2d).max() > 0


def test_dp_tp_grads_match_per_camera_mean(rng):
    """(2 dp) x (2 tp) mesh vs plain per-camera rasterize: loss and
    per-gaussian grads must agree (psum over dp+tp == sum over cameras and
    tile rows)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("dp", "tp"))

    P = 48
    means = jnp.asarray(rng.normal(size=(P, 3)) * 0.6, jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(P, 2)) * 0.5 - 1.6), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(P, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.9, size=(P,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(P, 3)), jnp.float32)
    feats = jnp.asarray(rng.uniform(size=(P, 1)), jnp.float32)
    args = (means, scales, rots, opac, colors, feats)

    cams = [_cam(i, 2) for i in range(2)]
    gt = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)

    def ref_loss(*a):
        tot = 0.0
        for i, c in enumerate(cams):
            o = rasterize(*a, camera=c, bg_color=jnp.zeros(3), config=CFG)
            tot = tot + jnp.sum((o["render"] - gt[i]) ** 2)
        return tot / (2 * H * W)

    l_ref, g_ref = jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3, 4, 5))(*args)
    l_dp, g_dp = dp_tp_render_grads(
        mesh, *args, stack_cameras(cams), gt, CFG
    )

    np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-5)
    for n, a, b in zip(
        ["means", "scales", "rots", "opac", "colors", "feats"], g_dp, g_ref
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), n
        s = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=3e-3 * s + 1e-5, err_msg=n)


def test_dp_densify_stats_sum_per_view_norms(rng):
    """DP stats must accumulate like n sequential single-chip iterations:
    sum of per-view grad norms (norm-of-the-mean cancels opposing screen
    gradients and under-fires densification)."""
    opt = OptimizationParams()
    cams = [_cam(i, 2) for i in range(2)]
    gts = [jnp.asarray(rng.uniform(size=(H, W, 3)), jnp.float32) for i in range(2)]

    # Two sequential single-chip steps from the same init. Both states
    # must come from the SAME rng stream position.
    init_rng = np.random.default_rng(123)
    state_a = _state(init_rng)
    plain = make_train_step("surfel", opt, PipelineParams(), 3.0, CFG,
                            envmap_n_samples=4)
    extra = {k: v[0] for k, v in _extra(1).items()}
    s = state_a
    # Accumulate stats for both views WITHOUT applying the first update's
    # param change to the second view (the DP step computes both views at
    # the same params): run each view from the same initial state and sum.
    accs, dens = [], []
    for cam, gt in zip(cams, gts):
        si = jax.tree_util.tree_map(lambda a: a.copy() if hasattr(a, "copy") else a, state_a)
        so, _ = plain(si, cam, gt, dict(extra), cam, gt)
        accs.append(np.asarray(so.model.xyz_gradient_accum))
        dens.append(np.asarray(so.model.denom))
    expect_acc = accs[0] + accs[1]
    expect_den = dens[0] + dens[1]

    state_b = _state(np.random.default_rng(123))
    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    dp = make_dp_production_step(mesh, "surfel", opt, PipelineParams(), 3.0,
                                 CFG, envmap_n_samples=4)
    sb, _ = dp(state_b, stack_cameras(cams), jnp.stack(gts), _extra(2),
               stack_cameras(cams), jnp.stack(gts), None)
    np.testing.assert_allclose(
        np.asarray(sb.model.denom), expect_den, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sb.model.xyz_gradient_accum), expect_acc, rtol=1e-4,
        atol=1e-7,
    )


def _dp_scene(rng, n_cams=8, W=24, H=24, P=48):
    from materialrefgs_tpu.ops.rasterize.reference import rasterize_reference

    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.5
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.3 - 1.3)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.5, 0.95, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = np.zeros((P, 1), np.float32)
    cams, images = [], []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        eye = np.array([3.5 * np.sin(ang), 0.5, -3.5 * np.cos(ang)])
        cam = look_at_camera(
            eye, np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.9, 0.9, W, H
        )
        out = rasterize_reference(
            *(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats)),
            camera=cam, bg_color=jnp.zeros(3),
        )
        cams.append(cam)
        images.append(np.asarray(out["render"]))
    return cams, images, means


def _make_trainer(cls, rng_seed, cams, images, means, **kw):
    from materialrefgs_tpu.train.trainer import Trainer  # noqa: F401

    r = np.random.default_rng(rng_seed)
    pts = means + r.normal(size=means.shape).astype(np.float32) * 0.1
    cols = r.uniform(size=(len(pts), 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=128)
    opt = dataclasses.replace(
        OptimizationParams(),
        use_perceptual_loss=False,
        initial=1,
        init_until_iter=10_000,
        densify_from_iter=10,
        densification_interval=25,
        feature_rest_from_iter=100_000,
        lambda_normal_render_depth=0.0,
        lambda_dist=0.0,
    )
    return cls(
        model, cams, images, opt, PipelineParams(),
        cameras_extent=3.0,
        raster_cfg=RasterizeConfig(pair_capacity=1 << 12, interpret=True),
        envmap_res=16,
        seed=3407,
        **kw,
    )


@pytest.mark.slow
def test_dp_trainer_one_device_matches_single_chip(rng):
    """DPTrainer on a 1-device mesh reproduces the single-chip Trainer's
    loss trajectory exactly (VERDICT r2 item 4 'Done' criterion): same rng
    consumption, pmean over one chip is the identity, densify included."""
    from materialrefgs_tpu.parallel.dp_trainer import DPTrainer
    from materialrefgs_tpu.train.trainer import Trainer

    cams, images, means = _dp_scene(rng)
    t1 = _make_trainer(Trainer, 1, cams, images, means)
    t2 = _make_trainer(
        DPTrainer, 1, cams, images, means,
        mesh=Mesh(np.array(jax.devices()[:1]), ("dp",)),
    )
    t1.train(40, log_every=1)
    t2.train(40, log_every=1)
    l1 = [m["loss"] for m in t1.metrics_log]
    l2 = [m["loss"] for m in t2.metrics_log]
    np.testing.assert_allclose(l2, l1, rtol=2e-4)
    assert t1.metrics_log[-1]["n_alive"] == t2.metrics_log[-1]["n_alive"]


@pytest.mark.slow
def test_dp_trainer_eight_devices_converges(rng):
    """8-chip CPU-sim DPTrainer: the full orchestration (densify, resets,
    escalation polling) runs and the batched step converges."""
    from materialrefgs_tpu.parallel.dp_trainer import DPTrainer

    cams, images, means = _dp_scene(rng)
    t = _make_trainer(
        DPTrainer, 1, cams, images, means,
        mesh=Mesh(np.array(jax.devices()[:8]), ("dp",)),
    )
    t.train(30, log_every=1)
    log = t.metrics_log
    first = np.mean([m["psnr"] for m in log[:5]])
    last = np.mean([m["psnr"] for m in log[-5:]])
    assert np.isfinite(last)
    assert last > first + 0.5, (first, last)
    assert log[-1]["n_alive"] >= 48


@pytest.mark.slow
@pytest.mark.core
def test_dp_trainer_env_gs_maintenance(rng):
    """VERDICT r4 item 10: the env-GS maintenance path (init at the surfel2
    boundary, densify cadence, opacity reset + absolute prune grace,
    freeze_geo past env_update_until) orchestrated by DPTrainer on a
    multi-device ('dp',) mesh. The round-5 config fields must drive the
    SAME host-side cadence under DP as single-chip."""
    from materialrefgs_tpu.ops.tracer.api import TracerConfig
    from materialrefgs_tpu.parallel.dp_trainer import DPTrainer

    cams, images, means = _dp_scene(rng, n_cams=4)
    r = np.random.default_rng(1)
    pts = means + r.normal(size=means.shape).astype(np.float32) * 0.1
    cols = r.uniform(size=(len(pts), 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=128)
    opt = dataclasses.replace(
        OptimizationParams(),
        use_perceptual_loss=False,
        initial=1,
        init_until_iter=1,
        volume_render_until_iter=0,
        indirect_from_iter=2,
        multi_view_weight_from_iter=10**9,
        densify_from_iter=10**9,
        feature_rest_from_iter=100_000,
        lambda_normal_render_depth=0.0,
        lambda_dist=0.0,
        env_densify_interval=2,
        env_reset_interval=6,
        env_update_until_iter=12,
        # Grace spans the remaining update window: the toy scene's traced
        # indirect gradients are ~0, so post-reset opacities (0.01) can
        # never regrow — any un-graced prune (at 8/10/12) would kill the
        # cloud. Liveness at 14 therefore PROVES the grace suppressed them.
        env_prune_grace=100,
    )
    t = DPTrainer(
        model, cams, images, opt, PipelineParams(),
        cameras_extent=3.0,
        raster_cfg=RasterizeConfig(pair_capacity=1 << 12, interpret=True),
        envmap_res=16,
        seed=3407,
        tracer_cfg=TracerConfig(
            pair_capacity=1 << 12, cluster_pair_capacity=1 << 9, interpret=True
        ),
        use_mesh_visibility=False,
        mesh=Mesh(np.array(jax.devices()[:4]), ("dp",)),
    )
    t.train(14, log_every=1)
    # Env cloud born at the boundary, reset at 6, every later prune inside
    # the grace window suppressed, frozen past 12 — and alive at the end.
    assert t.state.env_gs is not None
    assert t._env_reset_at == 6
    last = t.metrics_log[-1]
    assert last["env_n_alive"] > 0, last
    assert np.isfinite(last["loss"])
    # freeze_geo: env xyz must not move after env_update_until_iter.
    xyz_at_freeze = np.asarray(t.state.env_gs.params.xyz).copy()
    t.train(2, start_iter=15, log_every=1)
    np.testing.assert_allclose(
        np.asarray(t.state.env_gs.params.xyz), xyz_at_freeze, atol=1e-7
    )
