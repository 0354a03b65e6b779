"""build_aligned_segments: proportional graceful truncation at capacity."""
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.ops.rasterize.layout import K_CHUNK
from materialrefgs_tpu.ops.segments import build_aligned_segments


@pytest.mark.core
def test_overflow_shrinks_segments_proportionally_keeping_near_pairs():
    """Over capacity, every segment keeps its NEAREST (lowest-key) pairs
    instead of trailing segments losing everything."""
    S = 2
    n_a, n_b = 3 * K_CHUNK, 6 * K_CHUNK  # demand = 9 chunks
    capacity = 6 * K_CHUNK  # >= 2*S*K_CHUNK -> proportional mode
    seg_id = jnp.concatenate([
        jnp.zeros(n_a, jnp.int32), jnp.ones(n_b, jnp.int32)
    ])
    key = jnp.concatenate([
        jnp.arange(n_a, dtype=jnp.float32),
        jnp.arange(n_b, dtype=jnp.float32),
    ])
    valid = jnp.ones(n_a + n_b, bool)
    seg = build_aligned_segments(seg_id, key, valid, S, capacity)

    c0, c1 = int(seg.seg_count[0]), int(seg.seg_count[1])
    assert c0 > 0 and c1 > 0, (c0, c1)  # nobody starved
    # Proportional: segment b keeps ~2x segment a.
    assert 1.5 < c1 / c0 < 2.7, (c0, c1)
    assert int(seg.overflow) == (n_a + n_b) - (c0 + c1) > 0
    # Kept pairs are the LOWEST keys of each segment: every dropped slot
    # (perm_pos == capacity) must have key >= every kept slot's key in the
    # same segment.
    pp = np.asarray(seg.perm_pos)
    k = np.asarray(key)
    sid = np.asarray(seg_id)
    for s in range(S):
        kept = k[(sid == s) & (pp < capacity)]
        dropped = k[(sid == s) & (pp >= capacity)]
        assert dropped.min() > kept.max()


def test_under_capacity_keeps_everything():
    S = 3
    seg_id = jnp.asarray(np.repeat([0, 1, 2], 5), jnp.int32)
    key = jnp.asarray(np.tile(np.arange(5, dtype=np.float32), 3))
    seg = build_aligned_segments(
        seg_id, key, jnp.ones(15, bool), S, 8 * K_CHUNK
    )
    assert int(seg.overflow) == 0
    assert [int(c) for c in seg.seg_count] == [5, 5, 5]
