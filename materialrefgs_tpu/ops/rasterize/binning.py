"""Tile binning: (gaussian, tile) pair expansion + sort + raw tile ranges.

TPU-native replacement for the CUDA binning stage
(rasterizer_impl.cu:72-113 duplicateWithKeys + CUB RadixSort +
identifyTileRanges:118). Differences by design:

  - Gaussians are depth-sorted FIRST (one argsort over P), so pair expansion
    emits pairs already in depth order and a single stable sort by tile id
    yields per-tile front-to-back order — equivalent to the CUDA 64-bit
    (tileID << 32 | depth-bits) radix sort.
  - Tile ranges are RAW (unaligned) offsets into the sorted pair list. The
    Pallas kernels DMA the enclosing 128-aligned window per tile and mask
    the over-read head/tail lanes — no padded slot layout exists, so no
    B-sized scatter or slot<->sorted indirection is ever built. The backward
    kernel writes its chunk-major output at `chunk_base`-derived offsets,
    which keeps overlapping tile windows write-disjoint.
  - Static shapes: the pair list has fixed capacity `pair_capacity`; pairs
    past it (the farthest gaussians', since expansion is depth-major) are
    dropped and reported via `overflow`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialrefgs_tpu.ops.rasterize.layout import K_CHUNK
from materialrefgs_tpu.ops.rasterize.preprocess import PreprocessOut


class BinningOut(NamedTuple):
    g_sorted: jax.Array  # (B,) int32 gaussian id per sorted pair (0 if invalid)
    tile_start: jax.Array  # (T+1,) int32 RAW start offsets (unaligned)
    tile_count: jax.Array  # (T,) int32 pairs per tile
    chunk_base: jax.Array  # (T+1,) int32 cumulative K-chunk windows per tile
    num_pairs: jax.Array  # () int32 valid pairs kept
    overflow: jax.Array  # () int32 pairs dropped due to capacity


def _broadcast_to_segments_multi(values, seg_starts, B):
    """values (M, S) int32 broadcast along segments with given start offsets
    (sorted, may repeat for empty segments) -> (M, B) with
    out[m, k] = values[m, seg_of(k)]. Exact for int32.

    Random gathers v[seg_of_pair] over millions of pairs are ~25 ms each on
    TPU; one delta-scatter + lane-major cumsum over B is ~5 ms and — since
    TPU scatter cost is ~70 ns per INDEX with channels riding along — M
    broadcasts sharing one index vector collapse into a single scatter."""
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
    # int32 cumsum can wrap for pathological scenes (millions of splats x
    # hundreds of touched tiles — e.g. an optimizer blow-up inflating
    # scales). A wrapped total would make raw_valid all-false and, worse,
    # make the reported overflow NEGATIVE so the trainer's escalation never
    # fires and the run silently renders background. Non-negative inputs
    # make wrap detectable as a negative prefix anywhere; clamp the total
    # to INT32_MAX so downstream mins/overflow stay loud.
    wrapped = jnp.min(cum) < 0
    total = jnp.where(wrapped, jnp.int32(2**31 - 1), total)
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

    # Per-tile raw ranges (num_tiles is small — searchsorted is fine here).
    tile_start = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_count = tile_start[1:] - tile_start[:-1]  # (T,)

    # Per-tile K-aligned over-read window sizes, in chunks: the kernels DMA
    # [floor_K(start), ...) and mask lanes outside [start, start+count).
    head = tile_start[:-1] - (tile_start[:-1] // K) * K
    n_chunks = jnp.where(tile_count > 0, (head + tile_count + K - 1) // K, 0)
    chunk_base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(n_chunks).astype(jnp.int32)]
    )

    num_kept = tile_start[-1]  # pairs with a real tile id (= min(total, B))
    return BinningOut(
        g_sorted=g_sorted,
        tile_start=tile_start,
        tile_count=tile_count,
        chunk_base=chunk_base,
        num_pairs=num_kept,
        overflow=total - num_kept,
    )


def n_chunk_slots(pair_capacity: int, num_tiles: int) -> int:
    """Static worst-case number of K-chunk windows across all tiles (each
    tile's over-read adds at most one extra chunk)."""
    return pair_capacity // K_CHUNK + num_tiles
