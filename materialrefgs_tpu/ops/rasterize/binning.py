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
import numpy as np

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


# Tight tile culling: rects up to MASK_W x MASK_W tiles get an exact
# per-tile keep bitmask (bits 0..24 in mask0, 25..48 in mask1).
MASK_W = 7
_MASK_LO_BITS = 25


def tile_keep_mask(pre: PreprocessOut, opacities: jax.Array):
    """Exact, output-neutral per-tile culling masks (one bit per rect tile).

    The CUDA binning (and round-1's) pairs a gaussian with EVERY tile of its
    screen AABB — a square from max(extent_x, extent_y) (preprocess.py:162,
    forward.cu:245) — so corner tiles of isotropic splats and most tiles of
    anisotropic ones produce pairs whose per-pixel test
    `alpha = opa*exp(-rho/2) >= 1/255` (forward.cu:397) can never pass.
    Culling those pairs changes NO output: the kernels' ok-mask already
    zeroes them in forward and backward. We drop them before pair slots are
    allocated, so binning sort, payload gather, both Pallas kernels, and the
    gradient scatter all shrink by the cull fraction.

    Exactness: for the 3D branch, rho3d(x,y) = (h1^2+h2^2)/h3^2 with
    h = adj(T) @ (x, y, 1) (the splat->pixel homography inverted without the
    1/det — sign-invariant), so {rho3d <= R} is the conic
    F(x,y) = h1^2 + h2^2 - R*h3^2 <= 0 with R = 2*ln(255*opa) (+ margin).
    When the quadratic part is positive definite, F is convex and its exact
    minimum over the tile's pixel box is at the unconstrained minimizer (if
    inside) or on one of the 4 edges; otherwise (hyperbolic/degenerate,
    edge-on splats) we keep the tile. The 2D low-pass branch keeps any tile
    whose box comes within rho2d = FILTER_INV_SQUARE*d^2 <= R of mean2d.

    Returns (mask0, mask1, use_mask, tiles_kept), all (P,). Gaussians whose
    rect exceeds MASK_W^2 keep every tile (use_mask=False)."""
    from materialrefgs_tpu.ops.rasterize.layout import (
        FILTER_INV_SQUARE,
        TILE,
    )

    rmx = pre.rect_min[:, 0].astype(jnp.int32)
    rmy = pre.rect_min[:, 1].astype(jnp.int32)
    w = (pre.rect_max[:, 0] - pre.rect_min[:, 0]).astype(jnp.int32)
    h = (pre.rect_max[:, 1] - pre.rect_min[:, 1]).astype(jnp.int32)
    use_mask = pre.valid & (w >= 1) & (h >= 1) & (w <= MASK_W) & (h <= MASK_W)

    T = jax.lax.stop_gradient(pre.T_rows)  # (P, 3, 3)
    # Rows of adj(T): cross products of T's COLUMNS (cyclic), so that
    # adj(T) @ p = det(T) * T^{-1} @ p.
    c0, c1, c2 = T[:, :, 0], T[:, :, 1], T[:, :, 2]
    u = jnp.cross(c1, c2)  # h1 coefficients (x, y, 1)
    v = jnp.cross(c2, c0)  # h2
    g3 = jnp.cross(c0, c1)  # h3
    opa = jax.lax.stop_gradient(opacities)
    R = 2.0 * jnp.log(jnp.maximum(255.0 * opa, 1e-12))
    # Conditioning: the adjugate rows are |T|^4-scale; normalize each
    # Gaussian's (u, v, sqrt(R)*g3) triple to O(1) before forming q. F scales
    # by s^2 > 0 uniformly, so the sign of its box-minimum is unchanged while
    # f32 rounding of the q products stops being dominated by the huge common
    # scale. (float64 is unavailable on TPU without global x64.)
    scale = jnp.sqrt(
        jnp.sum(u * u, axis=1)
        + jnp.sum(v * v, axis=1)
        + jnp.maximum(R, 0.0) * jnp.sum(g3 * g3, axis=1)
    )
    s = 1.0 / jnp.maximum(scale, 1e-30)
    u = u * s[:, None]
    v = v * s[:, None]
    g3 = g3 * s[:, None]

    def q(i, j):
        return u[:, i] * u[:, j] + v[:, i] * v[:, j] - R * g3[:, i] * g3[:, j]

    q11, q12, q22 = q(0, 0)[:, None], q(0, 1)[:, None], q(1, 1)[:, None]
    q13, q23, q33 = q(0, 2)[:, None], q(1, 2)[:, None], q(2, 2)[:, None]

    # Derived rounding bound (replaces the former empirical +0.05 rho
    # margin): the dominant f32 error in F comes from cancellation in the
    # cross products u/v/g3 and the q dot-products. Pre-cancellation
    # magnitudes bound it: |Delta u_i| <= 2 eps Uabs_i with Uabs the
    # absolute-value cross product, so |Delta q_ij| <= K eps (Uabs_i Uabs_j
    # + Vabs_i Vabs_j + R Gabs_i Gabs_j) =: qerr_ij (Uabs >= |u| absorbs the
    # product/summation rounding too). keep3d then tests Fmin <= tol where
    # tol evaluates the qerr polynomial at the box's largest |x|,|y| —
    # conservative in exactly the configurations where f32 is unreliable.
    def _abs_cross(a, b):
        return jnp.stack(
            [
                jnp.abs(a[:, 1] * b[:, 2]) + jnp.abs(a[:, 2] * b[:, 1]),
                jnp.abs(a[:, 2] * b[:, 0]) + jnp.abs(a[:, 0] * b[:, 2]),
                jnp.abs(a[:, 0] * b[:, 1]) + jnp.abs(a[:, 1] * b[:, 0]),
            ],
            axis=1,
        )

    uabs = _abs_cross(c1, c2) * s[:, None]
    vabs = _abs_cross(c2, c0) * s[:, None]
    gabs = _abs_cross(c0, c1) * s[:, None]
    _K_EPS = 16.0 * jnp.float32(np.finfo(np.float32).eps)
    Rmag = jnp.abs(R)

    def qerr(i, j):
        return _K_EPS * (
            uabs[:, i] * uabs[:, j]
            + vabs[:, i] * vabs[:, j]
            + Rmag * gabs[:, i] * gabs[:, j]
        )

    e11, e12, e22 = qerr(0, 0)[:, None], qerr(0, 1)[:, None], qerr(1, 1)[:, None]
    e13, e23, e33 = qerr(0, 2)[:, None], qerr(1, 2)[:, None], qerr(2, 2)[:, None]

    NT = MASK_W * MASK_W
    i = jnp.arange(NT, dtype=jnp.int32)[None, :]  # (1, 49)
    wg = jnp.maximum(w, 1)[:, None]
    ix = i % wg
    iy = i // wg
    in_rect = i < (w * h)[:, None]
    x0 = ((rmx[:, None] + ix) * TILE).astype(jnp.float32)
    y0 = ((rmy[:, None] + iy) * TILE).astype(jnp.float32)
    x1 = x0 + (TILE - 1)
    y1 = y0 + (TILE - 1)

    det2 = q11 * q22 - q12 * q12
    elliptic = (q11 > 0.0) & (det2 > 0.0)
    sq11 = jnp.where(elliptic, q11, 1.0)
    sq22 = jnp.where(elliptic, q22, 1.0)
    sdet2 = jnp.where(elliptic, det2, 1.0)

    def F(x, y):
        return (
            q11 * x * x + 2.0 * q12 * x * y + q22 * y * y
            + 2.0 * q13 * x + 2.0 * q23 * y + q33
        )

    # Convex min over the box: unconstrained center if inside, else 4 edges.
    xc = (q12 * q23 - q22 * q13) / sdet2
    yc = (q12 * q13 - q11 * q23) / sdet2
    inside = (xc >= x0) & (xc <= x1) & (yc >= y0) & (yc <= y1)
    yx0 = jnp.clip(-(q12 * x0 + q23) / sq22, y0, y1)
    yx1 = jnp.clip(-(q12 * x1 + q23) / sq22, y0, y1)
    xy0 = jnp.clip(-(q12 * y0 + q13) / sq11, x0, x1)
    xy1 = jnp.clip(-(q12 * y1 + q13) / sq11, x0, x1)
    Fmin = jnp.minimum(
        jnp.minimum(F(x0, yx0), F(x1, yx1)), jnp.minimum(F(xy0, y0), F(xy1, y1))
    )
    Fmin = jnp.where(inside, jnp.minimum(Fmin, F(xc, yc)), Fmin)
    xm = jnp.maximum(jnp.abs(x0), jnp.abs(x1))
    ym = jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    tol = (
        e11 * xm * xm + 2.0 * e12 * xm * ym + e22 * ym * ym
        + 2.0 * e13 * xm + 2.0 * e23 * ym + e33
    )
    keep3d = Fmin <= tol

    cx = pre.mean2d[:, 0:1]
    cy = pre.mean2d[:, 1:2]
    dx = jnp.maximum(jnp.maximum(x0 - cx, cx - x1), 0.0)
    dy = jnp.maximum(jnp.maximum(y0 - cy, cy - y1), 0.0)
    keep2d = FILTER_INV_SQUARE * (dx * dx + dy * dy) <= R[:, None]

    keep = in_rect & (keep2d | keep3d | ~elliptic)
    bit = keep.astype(jnp.int32)
    lo = _MASK_LO_BITS
    mask0 = jnp.sum(bit[:, :lo] << i[0, :lo][None, :], axis=1)
    mask1 = jnp.sum(bit[:, lo:] << i[0, : NT - lo][None, :], axis=1)
    mask0 = jnp.where(use_mask, mask0, 0)
    mask1 = jnp.where(use_mask, mask1, 0)
    kept = jax.lax.population_count(mask0) + jax.lax.population_count(mask1)
    tiles_kept = jnp.where(use_mask, kept, w * h)
    return mask0, mask1, use_mask, tiles_kept


def _popcount_below(m0, m1, n):
    """Number of set bits at positions < n (n in [0, 49]) of the split mask."""
    lo = _MASK_LO_BITS
    nlo = jnp.minimum(n, lo)
    c = jax.lax.population_count(m0 & ((jnp.int32(1) << nlo) - 1))
    nhi = jnp.clip(n - lo, 0, MASK_W * MASK_W - lo)
    return c + jax.lax.population_count(m1 & ((jnp.int32(1) << nhi) - 1))


def bin_pairs(
    pre: PreprocessOut,
    grid_x: int,
    grid_y: int,
    pair_capacity: int,
    opacities: jax.Array | None = None,
) -> BinningOut:
    """`pre` must already be depth-sorted (see api.rasterize).

    With `opacities`, tight per-tile culling (tile_keep_mask) runs first and
    culled tiles never consume pair slots, so every B-sized cost downstream
    (sort, gathers, kernels, gradient scatter) shrinks by the cull fraction."""
    num_tiles = grid_x * grid_y
    K = K_CHUNK
    assert pair_capacity % K == 0
    counts_g = pre.tiles_touched.astype(jnp.int32)  # (P,)
    if opacities is not None:
        mask0, mask1, use_mask, tiles_kept = tile_keep_mask(pre, opacities)
        counts_g = jnp.minimum(counts_g, tiles_kept.astype(jnp.int32))
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
    chans = [gauss_ids, offsets, packed]
    if opacities is not None:
        # Bit 30 flags mask-culled gaussians; the keep masks ride the same
        # scatter as two more channels (values < 2^25, int32-delta exact).
        packed = packed | (use_mask.astype(jnp.int32) << 30)
        chans = [gauss_ids, offsets, packed, mask0, mask1]
    bcast = _broadcast_to_segments_multi(jnp.stack(chans), offsets, B)
    g, off_p, packed_p = bcast[0], bcast[1], bcast[2]
    rmx_p = packed_p & 0x3FF
    rmy_p = (packed_p >> 10) & 0x3FF
    rw_p = (packed_p >> 20) & 0x3FF
    raw_valid = k < jnp.minimum(total, B)

    local = k - off_p
    if opacities is not None:
        # Pair `local` is the local-th KEPT tile: its rect-local index is the
        # (local+1)-th set bit of the keep mask, found by a 6-step binary
        # climb over prefix popcounts (j = max index with popcount_below(j)
        # <= local, which lands exactly on that set bit).
        m0_p, m1_p = bcast[3], bcast[4]
        j = jnp.zeros_like(local)
        for step in (32, 16, 8, 4, 2, 1):
            cand = j + step
            ok = (cand <= MASK_W * MASK_W) & (
                _popcount_below(m0_p, m1_p, cand) <= local
            )
            j = jnp.where(ok, cand, j)
        local = jnp.where(((packed_p >> 30) & 1) == 1, j, local)
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
