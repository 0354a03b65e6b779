"""Multi-chip curriculum training: the full Trainer orchestration driving
the camera-batch DP production step.

The reference is single-GPU (SURVEY §2.3); this is the TPU scale-out of its
training loop (train_refnerf.py:1093-1495). One curriculum iteration feeds
one camera per chip through make_dp_production_step: gradients are pmean'd
over ICI inside the step, parameters stay replicated, and ALL host-side
orchestration — densify cadence, opacity/refl/scale resets, SH ladder,
mesh extraction, overflow escalation, checkpointing — is inherited from the
single-chip Trainer unchanged (it operates on the replicated state).

Iteration semantics: one DP step advances the curriculum by ONE iteration
(schedules, LR decay, reset cadences all keyed to it) while averaging
gradients over `ndev` views — large-batch training of the same objective.
A 1-device mesh reproduces the single-chip Trainer's trajectory exactly
(same rng consumption; pmean over one chip is the identity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from materialrefgs_tpu.parallel.data_parallel import (
    make_dp_production_step,
    stack_cameras,
)
from materialrefgs_tpu.train.trainer import Trainer


class DPTrainer(Trainer):
    """Trainer whose step runs on a ('dp',) device mesh, one camera/chip."""

    def __init__(self, *args, mesh: Mesh | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("dp",))
        assert mesh.axis_names == ("dp",), mesh.axis_names
        # NB self.mesh is the Trainer's traced TSDF MeshData; the device
        # mesh lives under its own name.
        self.device_mesh = mesh
        self.ndev = mesh.shape["dp"]

    def _step_fn(self, stage: str, warp_on: bool):
        key = (stage, warp_on)
        if key not in self._steps:
            self._steps[key] = make_dp_production_step(
                self.device_mesh, stage, self.opt, self.pipe, self.spatial_lr_scale,
                self.raster_cfg,
                with_warp=warp_on,
                with_mono_normal=self.normal_priors is not None,
                tracer_cfg=self.tracer_cfg,
                lpips_weights=self.lpips_weights,
                env_min_roughness=self.envmap_min_roughness,
                env_max_roughness=self.envmap_max_roughness,
                detect_anomaly=self.detect_anomaly,
            )
        return self._steps[key]

    def _run_step(self, iteration: int, stage: str) -> dict:
        cam_ids = [self._pick_view() for _ in range(self.ndev)]
        # Warp gating must be batch-uniform (one jitted step per (stage,
        # warp_on)): when the iteration gate is open, views without a usable
        # neighbor fall back to self-warp with photo weight 0 — the
        # homography is the identity so the term contributes ~0, matching
        # the single-chip behavior of simply skipping those views' warp.
        warp_on = self._warp_gate(iteration, stage)
        extras, ncams, ngts = [], [], []
        for cid in cam_ids:
            extra = self._build_extra(iteration, cid)
            if warp_on:
                on, ncam, ngt, pw = self._select_warp(iteration, stage, cid)
                if not on:
                    ncam, ngt, pw = self.cameras[cid], self.images[cid], 0.0
                extra["warp_photo_weight"] = jnp.float32(pw)
            else:
                ncam, ngt = self.cameras[cid], self.images[cid]
            extras.append(extra)
            ncams.append(ncam)
            ngts.append(ngt)

        cam_batch = stack_cameras([self.cameras[c] for c in cam_ids])
        gt_batch = jnp.stack([self.images[c] for c in cam_ids])
        extra_batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *extras)
        ncam_batch = stack_cameras(ncams)
        ngt_batch = jnp.stack(ngts)

        step = self._step_fn(stage, warp_on)
        mesh_data = self.mesh if stage == "surfel2" else None
        self.state, metrics = step(
            self.state, cam_batch, gt_batch, extra_batch, ncam_batch,
            ngt_batch, mesh_data,
        )
        self._last_cam_id = cam_ids[0]
        return metrics
