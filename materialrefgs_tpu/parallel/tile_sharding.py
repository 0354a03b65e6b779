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
    _permute,
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
        return _tile_local_render(
            means3d, scales, rotations, opacities, colors, features,
            camera, scale_modifier, config, grid_x, rows_local, axis,
        )

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


def _tile_local_render(
    means3d, scales, rotations, opacities, colors, features,
    camera, scale_modifier, config, grid_x, rows_local, axis,
):
    """Per-chip body: cull/bin/rasterize this chip's `rows_local` tile rows
    of `camera`. Runs inside a shard_map with `axis` mapped; returns the
    local (rows_local*grid_x, 256, C_OUT) tile block + overflow count."""
    S = features.shape[-1]
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

    # Depth sort through the _permute custom VJP: a plain gather's
    # transpose is an XLA scatter (~70 ns/index; 10+ ms per P-sized tree
    # in the backward) — the exact cost api.rasterize was rewritten to
    # avoid; the sharded path must not re-introduce it.
    order = jnp.argsort(pre.depth, stable=True)
    inv_order = jnp.argsort(order)

    def sort_by_depth(a):
        if not jnp.issubdtype(a.dtype, jnp.floating):
            return a[order]
        return _permute(a, order, inv_order)

    pre_s = jax.tree_util.tree_map(sort_by_depth, pre)
    opac_s = _permute(opacities, order, inv_order)
    bins = binning.bin_pairs(
        pre_s, grid_x, rows_local, config.pair_capacity, opacities=opac_s
    )

    payload_g = _build_payload(
        pre_s,
        opac_s,
        _permute(colors, order, inv_order),
        _permute(features, order, inv_order),
        S,
    )
    tiles_out = _render_pairs(
        S, grid_x, rows_local, camera.width, rows_local * TILE,
        config.interpret, payload_g, bins,
    )
    return tiles_out, bins.overflow[None]


def dp_tp_render_grads(
    mesh: Mesh,
    means3d, scales, rotations, opacities, colors, features,
    cam_batch: Camera,
    gt_batch: jax.Array,
    config: RasterizeConfig = RasterizeConfig(),
):
    """DP x TP 2D-mesh composition: cameras sharded over the 'dp' axis, each
    camera's tile rows sharded over the 'tp' axis, gaussians replicated. One
    shard_map over both axes; the scalar L2 loss is psum'd over the full mesh
    and jax.grad's shard_map transpose inserts the per-gaussian gradient
    psum (ICI all-reduce) automatically.

    Returns (loss, grads) where grads covers (means3d, scales, rotations,
    opacities, colors, features)."""
    n_dp, n_tp = mesh.shape["dp"], mesh.shape["tp"]
    H, W = int(gt_batch.shape[1]), int(gt_batch.shape[2])
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    assert gt_batch.shape[0] == n_dp and grid_y % n_tp == 0
    rows_local = grid_y // n_tp
    S = features.shape[-1]
    denom = float(n_dp * H * W)
    # Pad GT rows to the tile grid so the last tp shard's dynamic slice is
    # never clamped (a clamped start would score live rendered rows against
    # the WRONG GT rows when H is not a multiple of TILE).
    if grid_y * TILE != H:
        gt_batch = jnp.concatenate(
            [
                gt_batch,
                jnp.zeros(
                    (n_dp, grid_y * TILE - H, *gt_batch.shape[2:]),
                    gt_batch.dtype,
                ),
            ],
            axis=1,
        )

    def loss_of(means3d, scales, rotations, opacities, colors, features):
        def local(cam_b, gt_b):
            cam = jax.tree_util.tree_map(lambda x: x[0], cam_b)
            gt = gt_b[0]  # full (H, W, 3); we score only our tile rows
            tiles_out, _ = _tile_local_render(
                means3d, scales, rotations, opacities, colors, features,
                cam, 1.0, config, grid_x, rows_local, "tp",
            )
            blk = _unpack(
                tiles_out, S, grid_x, rows_local, W, rows_local * TILE,
                jnp.zeros(3),
            )
            row0 = jax.lax.axis_index("tp") * (rows_local * TILE)
            gt_blk = jax.lax.dynamic_slice_in_dim(gt, row0, rows_local * TILE, 0)
            # Trailing rows past H (non-multiple-of-16 images) are padding in
            # both: _unpack zero-fills and the slice is clamped; mask them.
            ry = row0 + jnp.arange(rows_local * TILE)
            m = (ry < H).astype(jnp.float32)[:, None, None]
            l = jnp.sum(m * (blk["render"] - gt_blk) ** 2)
            return jax.lax.psum(l, ("dp", "tp"))[None]

        l = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("dp"), P("dp")),
            out_specs=P("dp"),
            check_vma=False,
        )(cam_batch, gt_batch)
        return l[0] / denom

    return jax.value_and_grad(loss_of, argnums=(0, 1, 2, 3, 4, 5))(
        means3d, scales, rotations, opacities, colors, features
    )
