"""Tile binning: (gaussian, tile) pair expansion + sort + aligned tile ranges.

TPU-native replacement for the CUDA binning stage
(rasterizer_impl.cu:72-113 duplicateWithKeys + CUB RadixSort +
identifyTileRanges:118). Differences by design:

  - Gaussians are depth-sorted FIRST (one argsort over P), so pair expansion
    emits pairs already in depth order and a single stable sort by tile id
    yields per-tile front-to-back order — equivalent to the CUDA 64-bit
    (tileID << 32 | depth-bits) radix sort.
  - Each tile's pair range is padded to a multiple of K_CHUNK and starts at a
    K_CHUNK-aligned offset, so the Pallas kernels can DMA aligned chunks
    (Mosaic requires lane-tile-aligned HBM slices). Padding slots are marked
    invalid via `pair_valid`.
  - Static shapes: the padded pair list has fixed capacity `pair_capacity`;
    ranges that would exceed it are truncated (farthest-gaussian pairs drop
    first within a tile) and reported via `overflow`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialrefgs_tpu.ops.rasterize.layout import K_CHUNK
from materialrefgs_tpu.ops.rasterize.preprocess import PreprocessOut


class BinningOut(NamedTuple):
    pair_gauss: jax.Array  # (B,) int32 index into depth-sorted gaussians
    pair_valid: jax.Array  # (B,) bool — False for padding slots
    tile_start: jax.Array  # (T+1,) int32 K_CHUNK-aligned start offsets
    tile_count: jax.Array  # (T,) int32 valid pairs per tile (<= range size)
    num_pairs: jax.Array  # () int32 valid pairs kept
    overflow: jax.Array  # () int32 pairs dropped due to capacity


def bin_pairs(
    pre: PreprocessOut, grid_x: int, grid_y: int, pair_capacity: int
) -> BinningOut:
    """`pre` must already be depth-sorted (see api.rasterize)."""
    num_tiles = grid_x * grid_y
    K = K_CHUNK
    assert pair_capacity % K == 0
    counts_g = pre.tiles_touched  # (P,)
    cum = jnp.cumsum(counts_g)
    total = cum[-1]
    offsets = cum - counts_g

    B = pair_capacity
    k = jnp.arange(B, dtype=jnp.int32)
    # Pair k -> owning gaussian. Equivalent to searchsorted(cum, k, 'right')
    # but via scatter-add + cumsum: per-element binary search is ~50x slower
    # on TPU (random gathers) than one scan over B.
    marks = jnp.zeros(B, jnp.int32).at[
        jnp.where(offsets < B, offsets, B)
    ].add(1, mode="drop")
    g = jnp.cumsum(marks) - 1
    raw_valid = k < jnp.minimum(total, B)
    g_safe = jnp.clip(g, 0, counts_g.shape[0] - 1)

    local = k - offsets[g_safe]
    rect_min = pre.rect_min[g_safe]
    rect_w = jnp.maximum(pre.rect_max[g_safe, 0] - rect_min[:, 0], 1)
    ty = rect_min[:, 1] + local // rect_w
    tx = rect_min[:, 0] + local % rect_w
    tile = ty * grid_x + tx
    tile = jnp.where(raw_valid, tile, num_tiles)

    # Stable sort by tile keeps depth order within each tile.
    order = jnp.argsort(tile, stable=True)
    tile_sorted = tile[order]
    g_sorted = jnp.where(raw_valid, g_safe, 0)[order]

    # Per-tile raw ranges, then K-aligned padded layout.
    raw_start = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = raw_start[1:] - raw_start[:-1]  # (T,)
    padded = ((counts + K - 1) // K) * K
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )  # (T+1,), multiples of K

    tile_start = jnp.minimum(padded_start, B)
    tile_count = jnp.minimum(counts, tile_start[1:] - tile_start[:-1])

    # Scatter sorted pairs into the padded layout.
    i = jnp.arange(B, dtype=jnp.int32)
    rank = i - raw_start[jnp.minimum(tile_sorted, num_tiles - 1)]
    pos = tile_start[jnp.minimum(tile_sorted, num_tiles - 1)] + rank
    keep = (
        (tile_sorted < num_tiles)
        & (rank < tile_count[jnp.minimum(tile_sorted, num_tiles - 1)])
    )
    pos = jnp.where(keep, pos, B)  # dropped slots scatter out of bounds

    pair_gauss = jnp.zeros(B, jnp.int32).at[pos].set(g_sorted, mode="drop")
    pair_valid = jnp.zeros(B, bool).at[pos].set(keep, mode="drop")

    num_kept = jnp.sum(tile_count)
    return BinningOut(
        pair_gauss=pair_gauss,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_count.astype(jnp.int32),
        num_pairs=num_kept,
        overflow=total - num_kept,
    )
