"""Multi-host camera-batch data parallelism over DCN (jax.distributed).

The reference is single-process, single-GPU (SURVEY §2.3: no
torch.distributed anywhere). The TPU-native scale-out axis ACROSS hosts is
camera batching: every process holds the full replicated gaussian + env
parameters, renders its own process-local cameras, and the per-gaussian
gradient all-reduce inside the train step covers both legs — intra-host
over ICI, cross-host over DCN — because jax.distributed fuses all
processes' chips into one global device mesh. Nothing in the step function
changes; the mesh just gets wider.

CPU simulation (no multi-host TPU hardware needed): each process forces the
CPU platform with N virtual devices and the 'gloo' cross-process collective
backend, so a 2-process x 4-device run exercises exactly the same
make_array_from_process_local_data + shard_map + pmean path a 2-host TPU
pod slice would. `python -m materialrefgs_tpu.parallel.multihost --help`
runs one worker; tests/test_multihost.py spawns the full rendezvous.
"""
from __future__ import annotations

import numpy as np


def initialize_cpu_sim(coordinator: str, num_processes: int, process_id: int,
                       local_devices: int = 4):
    """Join a CPU-simulated multi-host rendezvous. Must run before any other
    jax API touches a backend."""
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax


def global_dp_mesh(axis: str = "dp"):
    """One mesh over every chip of every host, in process order."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def shard_process_local(mesh, tree, axis: str = "dp"):
    """Turn per-process local camera/image batches (leading dim =
    local_device_count) into one global array sharded over `axis`: the
    multi-host analog of data_parallel.stack_cameras."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def to_global(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(to_global, tree)


def _worker(coordinator: str, num_processes: int, process_id: int,
            local_devices: int) -> None:
    """One simulated host: tiny scene, global ('dp',) mesh over all hosts'
    devices, one DP train step with cross-host gradient pmean."""
    jax = initialize_cpu_sim(coordinator, num_processes, process_id, local_devices)
    import jax.numpy as jnp

    from materialrefgs_tpu.cameras import look_at_camera
    from materialrefgs_tpu.config import OptimizationParams, PipelineParams
    from materialrefgs_tpu.models import gaussian_model as gm
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.parallel.data_parallel import (
        make_dp_train_step,
        stack_cameras,
    )
    from materialrefgs_tpu.train.trainer import init_train_state

    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}"
    )
    mesh = global_dp_mesh()

    rng = np.random.default_rng(0)  # same scene on every host
    W = H = 32
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    cols = rng.uniform(size=(64, 3)).astype(np.float32)
    model = gm.create_from_points(pts, cols, capacity=128)
    opt = OptimizationParams()
    state = init_train_state(model, opt, envmap_res=32)

    # Process-local cameras: host k contributes global camera ids
    # [k*local : (k+1)*local].
    cams = []
    for i in range(local_devices):
        gidx = process_id * local_devices + i
        ang = 2 * np.pi * gidx / n_global
        eye = np.array([3.0 * np.sin(ang), 0.4, -3.0 * np.cos(ang)])
        cams.append(
            look_at_camera(eye, np.zeros(3), np.array([0.0, 1.0, 0.0]),
                           0.9, 0.9, W, H)
        )
    lrng = np.random.default_rng(100 + process_id)
    local_gt = lrng.uniform(size=(local_devices, H, W, 3)).astype(np.float32)

    cam_batch = shard_process_local(mesh, stack_cameras(cams))
    gt_batch = shard_process_local(mesh, local_gt)

    step = make_dp_train_step(
        mesh, opt, PipelineParams(), spatial_lr_scale=3.0,
        raster_cfg=RasterizeConfig(pair_capacity=1 << 10, interpret=True),
        envmap_n_samples=4,
    )
    state, metrics = step(state, cam_batch, gt_batch, jnp.float32(1.0))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), "non-finite loss across hosts"
    # The pmean makes params bit-identical on every host; print a digest the
    # test compares across processes to prove the DCN all-reduce happened.
    digest = float(jnp.sum(jnp.abs(state.model.params.xyz)))
    print(f"MULTIHOST OK p{process_id}/{num_processes} "
          f"loss={loss:.6f} digest={digest:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default="localhost:12421")
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    a = ap.parse_args()
    _worker(a.coordinator, a.num_processes, a.process_id, a.local_devices)
