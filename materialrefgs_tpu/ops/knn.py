"""Mean squared distance to 3 nearest neighbors (simple-knn replacement).

TPU-native replacement for submodules/simple-knn (distCUDA2,
simple_knn.cu:44-187): Morton-sort the points, then search a +-WINDOW
neighborhood in Morton order. The CUDA version is exact via box culling; the
windowed search is approximate but tight for scale initialization (values are
sqrt'd, clamped, and only seed per-gaussian scales, gaussian_model.py:367).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _morton3d(q: jax.Array) -> jax.Array:
    """Interleave 10-bit coords (P, 3) uint32 -> (P,) int32 Morton codes."""

    def expand(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x30000FF
        v = (v | (v << 8)) & 0x300F00F
        v = (v | (v << 4)) & 0x30C30C3
        v = (v | (v << 2)) & 0x9249249
        return v

    return expand(q[:, 0]) | (expand(q[:, 1]) << 1) | (expand(q[:, 2]) << 2)


import functools


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_dist2(points: jax.Array, k: int = 3, window: int = 64) -> jax.Array:
    """(P, 3) -> (P,) mean squared distance to the k nearest neighbors.

    Jitted as one program: a dozen eager ops each pay a separate (remote,
    variable-latency) compile on this platform."""
    P = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0).astype(jnp.int32)
    order = jnp.argsort(_morton3d(q))
    pts = points[order]

    # Candidate offsets: +-window in Morton order (excluding self).
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # (2W,)
    raw_idx = jnp.arange(P)[:, None] + offs[None, :]
    in_range = (raw_idx >= 0) & (raw_idx < P)
    idx = jnp.clip(raw_idx, 0, P - 1)
    cand = pts[idx]  # (P, 2W, 3)
    d2 = jnp.sum((cand - pts[:, None, :]) ** 2, axis=-1)
    # Out-of-range offsets (clipped to the boundary point) would duplicate
    # one candidate across many slots and let top_k fill several of the k
    # spots with the SAME neighbor near the sort ends; mask them instead
    # (boundary points still have >= window in-range candidates on one side).
    d2 = jnp.where(in_range, d2, jnp.inf)
    knn = -jax.lax.top_k(-d2, k)[0]  # k smallest
    mean_d2 = jnp.mean(jnp.where(jnp.isfinite(knn), knn, 0.0), axis=-1)

    inv = jnp.argsort(order)
    return mean_d2[inv]
