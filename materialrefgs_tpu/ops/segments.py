"""Generic sorted-segment builder for Pallas chunked kernels.

Shared machinery for the rasterizer and the splat tracer: given a list of
candidate pairs (segment id, sort key, valid flag), produce a fixed-capacity
layout where each segment's pairs are contiguous, sorted by key, and each
segment starts at a K_CHUNK-aligned offset (Mosaic DMA alignment).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialrefgs_tpu.ops.rasterize.layout import K_CHUNK


class SegmentLayout(NamedTuple):
    perm_pos: jax.Array  # (N,) destination slot per input pair (== capacity -> dropped)
    seg_start: jax.Array  # (S+1,) aligned start offsets
    seg_count: jax.Array  # (S,) valid pairs per segment
    num_kept: jax.Array  # () int32
    overflow: jax.Array  # () int32


def build_aligned_segments(
    seg_id: jax.Array,  # (N,) int32 in [0, S); invalid pairs may hold anything
    sort_key: jax.Array,  # (N,) f32 ordering within segment
    valid: jax.Array,  # (N,) bool
    num_segments: int,
    capacity: int,
) -> SegmentLayout:
    assert capacity % K_CHUNK == 0
    N = seg_id.shape[0]
    S = num_segments
    sid = jnp.where(valid, seg_id, S).astype(jnp.int32)

    # Lexicographic (segment, key) sort carrying the original index — one
    # fused lax.sort instead of two argsorts + gathers.
    idx = jnp.arange(N, dtype=jnp.int32)
    sid_sorted, _, order = jax.lax.sort(
        (sid, sort_key.astype(jnp.float32), idx), is_stable=True, num_keys=2
    )

    raw_start = jnp.searchsorted(
        sid_sorted, jnp.arange(S + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts = raw_start[1:] - raw_start[:-1]
    if capacity >= 2 * S * K_CHUNK:
        # Graceful truncation: when demand exceeds capacity, shrink every
        # segment PROPORTIONALLY instead of zeroing out the trailing
        # segments (which removed whole image regions' supervision). Pairs
        # are key-sorted within each segment (depth / ray-t), so the
        # per-segment cut drops the FAR tail — exactly what front-to-back
        # alpha compositing attenuates most. The S*K_CHUNK headroom term
        # guarantees the padded layout fits. (f32 ratio: counts < 2^24, so
        # the floor is at worst off by one pair.)
        padded = ((counts + K_CHUNK - 1) // K_CHUNK) * K_CHUNK
        total_padded = jnp.sum(padded)
        ratio = (
            jnp.float32(capacity) - jnp.float32(S * K_CHUNK)
        ) / jnp.maximum(total_padded.astype(jnp.float32), 1.0)
        counts_eff = jnp.where(
            total_padded <= capacity,
            counts,
            jnp.floor(counts.astype(jnp.float32) * ratio).astype(jnp.int32),
        )
    else:
        # Capacity can't give every segment even one chunk: keep the legacy
        # leading-segment layout (tiny-capacity test configs).
        counts_eff = counts
    padded_eff = ((counts_eff + K_CHUNK - 1) // K_CHUNK) * K_CHUNK
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_eff).astype(jnp.int32)]
    )
    seg_start = jnp.minimum(padded_start, capacity)
    seg_count = jnp.minimum(counts_eff, seg_start[1:] - seg_start[:-1]).astype(
        jnp.int32
    )

    # Per-sorted-pair segment attributes via delta-scatter + cumsum (sorted
    # segment ids — avoids per-pair random gathers, see rasterize/binning.py).
    def broadcast(values):
        deltas = jnp.diff(values, prepend=jnp.zeros((1,), values.dtype))
        i = jnp.where(raw_start[:-1] < N, raw_start[:-1], N)
        marks = jnp.zeros(N, values.dtype).at[i].add(deltas, mode="drop")
        return jnp.cumsum(marks)

    rank = jnp.arange(N, dtype=jnp.int32)
    local = rank - broadcast(raw_start[:-1])
    pos_sorted = broadcast(seg_start[:-1]) + local
    keep = (sid_sorted < S) & (local < broadcast(seg_count))
    pos_sorted = jnp.where(keep, pos_sorted, capacity)

    # perm_pos maps input pair index -> destination slot.
    perm_pos = jnp.zeros(N, jnp.int32).at[order].set(pos_sorted)
    num_kept = jnp.sum(seg_count)
    return SegmentLayout(
        perm_pos=perm_pos,
        seg_start=seg_start,
        seg_count=seg_count,
        num_kept=num_kept,
        overflow=jnp.sum(valid.astype(jnp.int32)) - num_kept,
    )


def scatter_pairs(values: jax.Array, perm_pos: jax.Array, capacity: int, fill=0):
    """Scatter (N, ...) values into (capacity, ...) slots (dropped -> fill)."""
    out_shape = (capacity,) + values.shape[1:]
    out = jnp.full(out_shape, fill, values.dtype)
    return out.at[perm_pos].set(values, mode="drop")
