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
    pair_src: jax.Array  # (B,) int32 SORTED-pair index per padded slot
    pair_valid: jax.Array  # (B,) bool — False for padding slots
    g_sorted: jax.Array  # (B,) int32 gaussian id per sorted pair
    tile_start: jax.Array  # (T+1,) int32 K_CHUNK-aligned start offsets
    tile_count: jax.Array  # (T,) int32 valid pairs per tile (<= range size)
    num_pairs: jax.Array  # () int32 valid pairs kept
    overflow: jax.Array  # () int32 pairs dropped due to capacity


def _broadcast_to_segments(values, seg_starts, B):
    """values (S,) int32 broadcast along segments with given start offsets
    (sorted, may repeat for empty segments) -> (B,) int32.

    Delta-scatter + cumsum: out[k] = values[seg_of(k)]. Exact for int32.
    Random gathers v[seg_of_pair] over millions of pairs are ~25ms each on
    TPU; one scan over B is ~5ms and replaces them all.
    """
    deltas = jnp.diff(values, prepend=jnp.zeros((1,), values.dtype))
    idx = jnp.where(seg_starts < B, seg_starts, B)
    marks = jnp.zeros(B, values.dtype).at[idx].add(deltas, mode="drop")
    return jnp.cumsum(marks)


def _broadcast_to_segments_multi(values, seg_starts, B):
    """(M, S) variant of _broadcast_to_segments -> (M, B). TPU scatter cost
    is ~70 ns per INDEX (channels ride along), so M broadcasts sharing one
    index vector collapse into a single scatter + one lane-major cumsum."""
    M = values.shape[0]
    deltas = jnp.diff(values, axis=1, prepend=jnp.zeros((M, 1), values.dtype))
    idx = jnp.where(seg_starts < B, seg_starts, B)
    marks = jnp.zeros((M, B), values.dtype).at[:, idx].add(deltas, mode="drop")
    return jnp.cumsum(marks, axis=1)


def bin_pairs(
    pre: PreprocessOut, grid_x: int, grid_y: int, pair_capacity: int
) -> BinningOut:
    """`pre` must already be depth-sorted (see api.rasterize)."""
    num_tiles = grid_x * grid_y
    K = K_CHUNK
    assert pair_capacity % K == 0
    counts_g = pre.tiles_touched.astype(jnp.int32)  # (P,)
    cum = jnp.cumsum(counts_g)
    total = cum[-1]
    offsets = (cum - counts_g).astype(jnp.int32)

    B = pair_capacity
    k = jnp.arange(B, dtype=jnp.int32)
    # Pair k -> owning gaussian and its per-gaussian attributes, all via
    # delta-scatter + cumsum over the (gaussian-major, hence sorted) pair
    # list — no per-pair random gathers. The three per-pair fields (gaussian
    # id, segment offset, packed rect) share one scatter.
    P = counts_g.shape[0]
    gauss_ids = jnp.arange(P, dtype=jnp.int32)
    # Pack (rect_min_x, rect_min_y, rect_w) into one word so the three
    # per-gaussian rect fields ride a single segment-broadcast channel.
    # 10 bits per field supports grids up to 1023 tiles per side (16k px);
    # deltas of packed non-negative fields stay exact in int32.
    rmx = pre.rect_min[:, 0].astype(jnp.int32)
    rmy = pre.rect_min[:, 1].astype(jnp.int32)
    rw = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1).astype(jnp.int32)
    assert grid_x < 1024 and grid_y < 1024, "tile grid exceeds 10-bit packing"
    packed = rmx | (rmy << 10) | (rw << 20)
    bcast = _broadcast_to_segments_multi(
        jnp.stack([gauss_ids, offsets, packed]), offsets, B
    )
    g, off_p, packed_p = bcast[0], bcast[1], bcast[2]
    rmx_p = packed_p & 0x3FF
    rmy_p = (packed_p >> 10) & 0x3FF
    rw_p = packed_p >> 20
    raw_valid = k < jnp.minimum(total, B)

    local = k - off_p
    ty = rmy_p + local // rw_p
    tx = rmx_p + local % rw_p
    tile = ty * grid_x + tx
    tile = jnp.where(raw_valid, tile, num_tiles).astype(jnp.int32)

    # Stable sort by tile keeps depth order within each tile; carry the
    # gaussian id (payload gather key) through the sort.
    g_masked = jnp.where(raw_valid, g, 0).astype(jnp.int32)
    tile_sorted, g_sorted = jax.lax.sort(
        (tile, g_masked), is_stable=True, num_keys=1
    )

    # Per-tile raw ranges (num_tiles is small — searchsorted is fine here),
    # then K-aligned padded layout.
    raw_start = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = raw_start[1:] - raw_start[:-1]  # (T,)
    padded = ((counts + K - 1) // K) * K
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )  # (T+1,), multiples of K

    tile_start = jnp.minimum(padded_start, B)
    tile_count = jnp.minimum(counts, tile_start[1:] - tile_start[:-1]).astype(jnp.int32)

    # The padded slot layout is built WITHOUT any B-sized scatter (a TPU
    # scatter costs ~70 ns/index — ~10 ms here). Both directions of the
    # slot <-> sorted-pair mapping are piecewise-linear in the segment
    # structure, so two multi-channel segment broadcasts express them:
    #   slot s (segments = tile_start):  src(s)  = s - shift[t(s)],
    #                                    valid   = s < tile_start[t] + count[t]
    #   sorted i (segments = raw_start): slot(i) = i + shift[t(i)],
    #                                    kept    = i < raw_start[t] + count[t]
    shift = tile_start[:-1] - raw_start[:-1]
    se = _broadcast_to_segments_multi(
        jnp.stack([shift, tile_start[:-1] + tile_count]), tile_start[:-1], B
    )
    slot_shift, slot_lim = se[0], se[1]
    pair_valid = k < slot_lim
    pair_src_sorted = jnp.clip(jnp.where(pair_valid, k - slot_shift, 0), 0, B - 1)

    num_kept = jnp.sum(tile_count)
    return BinningOut(
        pair_src=pair_src_sorted,
        pair_valid=pair_valid,
        g_sorted=g_sorted,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_kept,
        overflow=total - num_kept,
    )
