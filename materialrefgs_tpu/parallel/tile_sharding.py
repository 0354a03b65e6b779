"""Tile-sharded single-camera rasterization over a chip mesh.

The second scale-out axis (SURVEY §2.3): one camera's 16x16 tiles are
partitioned row-wise across chips, gaussians replicated; each chip culls,
bins and rasterizes only its tile rows with the unmodified Pallas kernels.

No kernel changes are needed: shifting the transmat row Tv' = Tv - off*Tw
and mean2d_y' = mean2d_y - off (off = first pixel row of the chip's block)
makes local pixel coordinates correct, because the per-pixel planes are
l = pix_y*Tw - Tv and the low-pass term uses mean2d - pix. The shift is
applied with differentiable jnp ops, so the VJP chain (including the
dTw += -off * dTv term) falls out of autodiff, and shard_map's transpose
inserts the per-gaussian gradient psum over ICI automatically.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.ops.rasterize import binning
from materialrefgs_tpu.ops.rasterize.api import (
    RasterizeConfig,
    _build_payload,
    _render_pairs,
    _unpack,
)
from materialrefgs_tpu.ops.rasterize.layout import K_CHUNK, TILE
from materialrefgs_tpu.ops.rasterize.preprocess import preprocess


def rasterize_tile_sharded(
    mesh: Mesh,
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    features: jax.Array,
    camera: Camera,
    bg_color: jax.Array,
    scale_modifier: float = 1.0,
    config: RasterizeConfig = RasterizeConfig(),
    axis: str = "tp",
) -> dict:
    """Differentiable tile-sharded rasterization. `config.pair_capacity` is
    the PER-CHIP pair budget. Returns the same map dict as api.rasterize."""
    H, W = camera.height, camera.width
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    n = mesh.shape[axis]
    assert grid_y % n == 0, f"grid_y {grid_y} must divide by {n} chips"
    rows_local = grid_y // n
    S = features.shape[-1]

    def local_fn(means3d, scales, rotations, opacities, colors, features):
        d = jax.lax.axis_index(axis)
        row0 = d * rows_local
        pix_off = (row0 * TILE).astype(jnp.float32)

        pre = preprocess(means3d, scales, rotations, camera, scale_modifier)
        # Shift vertical coordinates into the local tile frame
        # (differentiable; see module docstring).
        T_rows = pre.T_rows.at[:, 1, :].add(-pix_off * pre.T_rows[:, 2, :])
        mean2d = pre.mean2d.at[:, 1].add(-pix_off)
        rect_min = pre.rect_min.at[:, 1].add(-row0)
        rect_max = pre.rect_max.at[:, 1].add(-row0)
        rect_min = rect_min.at[:, 1].set(jnp.clip(rect_min[:, 1], 0, rows_local))
        rect_max = rect_max.at[:, 1].set(jnp.clip(rect_max[:, 1], 0, rows_local))
        nxy = jnp.maximum(rect_max - rect_min, 0)
        tiles = (nxy[:, 0] * nxy[:, 1]).astype(jnp.int32)
        active = opacities >= (1.0 / 255.0)
        valid = pre.valid & active & (tiles > 0)
        pre = pre._replace(
            T_rows=T_rows,
            mean2d=mean2d,
            rect_min=rect_min,
            rect_max=rect_max,
            tiles_touched=jnp.where(valid, tiles, 0),
            valid=valid,
        )

        order = jnp.argsort(pre.depth, stable=True)
        pre_s = jax.tree_util.tree_map(lambda a: a[order], pre)
        bins = binning.bin_pairs(pre_s, grid_x, rows_local, config.pair_capacity)

        payload_g = _build_payload(
            pre_s, opacities[order], colors[order], features[order], S
        )
        tiles_out = _render_pairs(
            S, grid_x, rows_local, W, rows_local * TILE, config.interpret,
            payload_g, bins,
        )
        return tiles_out, bins.overflow[None]

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    tiles_out, overflow = sharded(
        means3d, scales, rotations, opacities, colors, features
    )
    out = _unpack(tiles_out, S, grid_x, grid_y, W, H, bg_color)
    out["overflow"] = jnp.sum(overflow)
    return out
