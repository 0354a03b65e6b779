"""Naive, fully-vectorized reference rasterizer (pure jnp, autodiff-able).

Bit-for-bit re-implementation of renderCUDA's per-pixel math
(submodules/diff-surfel-rasterization/cuda_rasterizer/forward.cu:272-463),
including the tile-rect coverage mask, the rho3d/rho2d low-pass branch, the
T < 1e-4 early-stop semantics, median depth, and the 2DGS distortion
accumulators. O(P * H * W) memory — use for tests/golden values on small
scenes; the Pallas tile kernel is the production path and is validated
against this module.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.ops.rasterize.preprocess import (
    FAR_N,
    FILTER_INV_SQUARE,
    NEAR_N,
    TILE,
    PreprocessOut,
    preprocess,
)

T_STOP = 1e-4
from materialrefgs_tpu.ops.rasterize.layout import ALPHA_MAX, ALPHA_MIN  # single source


def _per_gaussian_pixel_terms(pre: PreprocessOut, opacities, H, W):
    """Returns (alpha_eff (P,H,W), depth_px (P,H,W), covered (P,H,W))."""
    px = jnp.arange(W, dtype=jnp.float32)[None, None, :]  # (1,1,W)
    py = jnp.arange(H, dtype=jnp.float32)[None, :, None]  # (1,H,1)

    Tu = pre.T_rows[:, 0, :][:, None, None, :]  # (P,1,1,3)
    Tv = pre.T_rows[:, 1, :][:, None, None, :]
    Tw = pre.T_rows[:, 2, :][:, None, None, :]

    k = px[..., None] * Tw - Tu  # (P,H,W,3)
    l = py[..., None] * Tw - Tv
    p = jnp.cross(k, l)
    pz = p[..., 2]
    pz_ok = pz != 0.0
    pz_safe = jnp.where(pz_ok, pz, 1.0)
    s = p[..., :2] / pz_safe[..., None]
    rho3d = jnp.sum(s * s, axis=-1)

    d = pre.mean2d[:, None, None, :] - jnp.stack(
        [jnp.broadcast_to(px, (1, H, W)), jnp.broadcast_to(py, (1, H, W))], axis=-1
    )
    rho2d = FILTER_INV_SQUARE * jnp.sum(d * d, axis=-1)

    rho = jnp.minimum(rho3d, rho2d)
    depth_px = jnp.where(
        rho3d <= rho2d,
        s[..., 0] * Tw[..., 0] + s[..., 1] * Tw[..., 1] + Tw[..., 2],
        jnp.broadcast_to(Tw[..., 2], rho.shape),
    )

    power = -0.5 * rho
    alpha = jnp.minimum(ALPHA_MAX, opacities[:, None, None] * jnp.exp(power))

    # Tile-rect coverage: the CUDA kernel only visits pixels whose tile lies in
    # the Gaussian's rect (rasterizer_impl.cu duplicateWithKeys + renderCUDA).
    tx = (jnp.arange(W) // TILE)[None, None, :]
    ty = (jnp.arange(H) // TILE)[None, :, None]
    covered = (
        (tx >= pre.rect_min[:, 0][:, None, None])
        & (tx < pre.rect_max[:, 0][:, None, None])
        & (ty >= pre.rect_min[:, 1][:, None, None])
        & (ty < pre.rect_max[:, 1][:, None, None])
    )
    covered = covered & pre.valid[:, None, None]

    # Mirror the production binning's tight per-tile culling
    # (binning.tile_keep_mask): culled (gaussian, tile) pairs can never pass
    # the alpha test, so every composited output is unchanged — but they no
    # longer occupy a slot in the tile list, which shifts the 1-based
    # n_contrib/median_contrib indices. Apply the same mask here so the
    # contributor bookkeeping matches the Pallas path bit-for-bit.
    from materialrefgs_tpu.ops.rasterize import binning

    mask0, mask1, use_mask, _ = binning.tile_keep_mask(pre, opacities)
    rmx = pre.rect_min[:, 0][:, None, None]
    rmy = pre.rect_min[:, 1][:, None, None]
    rw = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)[:, None, None]
    local = (ty - rmy) * rw + (tx - rmx)
    loc_c = jnp.clip(local, 0, binning.MASK_W * binning.MASK_W - 1)
    lo = 25
    bit = jnp.where(
        loc_c < lo,
        (mask0[:, None, None] >> jnp.minimum(loc_c, lo - 1)) & 1,
        (mask1[:, None, None] >> jnp.clip(loc_c - lo, 0, 31)) & 1,
    )
    keep = jnp.where(use_mask[:, None, None], bit == 1, True)
    covered = covered & keep

    ok = (
        pz_ok
        & (depth_px >= NEAR_N)
        & (power <= 0.0)
        & (alpha >= ALPHA_MIN)
        & covered
    )
    alpha_eff = jnp.where(ok, alpha, 0.0)
    return alpha_eff, depth_px, covered


def rasterize_reference(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    features: jax.Array,
    camera: Camera,
    bg_color: jax.Array,
    scale_modifier: float = 1.0,
    pre: PreprocessOut | None = None,
) -> dict:
    """Rasterize. colors (P,3); features (P,S) extra channels; opacities (P,).

    Returns dict of (H,W,*) maps matching the CUDA outputs
    (forward.cu:443-461): render, feature, alpha, depth, median_depth, normal,
    distortion, final_T, M1, M2, n_contrib, median_contrib.
    """
    H, W = camera.height, camera.width
    if pre is None:
        pre = preprocess(means3d, scales, rotations, camera, scale_modifier)

    # Global front-to-back order: stable sort by view depth (the CUDA radix
    # sort of tile<<32|depth keys yields per-tile depth order; ties keep
    # Gaussian index order).
    order = jnp.argsort(pre.depth, stable=True)
    pre_s = jax.tree_util.tree_map(lambda a: a[order], pre)
    opac_s = opacities[order]
    colors_s = colors[order]
    feats_s = features[order]
    normal_s = pre_s.normal

    alpha, depth_px, covered = _per_gaussian_pixel_terms(pre_s, opac_s, H, W)
    P = alpha.shape[0]

    # Transmittance before including gaussian i: T_i = prod_{j<i} (1 - a_j).
    one_m = 1.0 - alpha
    T_incl = jnp.cumprod(one_m, axis=0)  # T after including i
    T_before = jnp.concatenate(
        [jnp.ones_like(T_incl[:1]), T_incl[:-1]], axis=0
    )  # exclusive cumprod

    # Early-stop: gaussian i is composited iff T_before*(1-a_i) >= 1e-4
    # (forward.cu:399-404); monotonicity makes the prefix test equivalent.
    included = (T_before * one_m) >= T_STOP
    w = alpha * T_before * included  # (P,H,W)

    render = jnp.einsum("phw,pc->hwc", w, colors_s, precision=jax.lax.Precision.HIGHEST)
    feature = jnp.einsum("phw,pc->hwc", w, feats_s, precision=jax.lax.Precision.HIGHEST)
    normal = jnp.einsum("phw,pc->hwc", w, normal_s, precision=jax.lax.Precision.HIGHEST)
    D = jnp.sum(w * depth_px, axis=0)

    # Distortion (forward.cu:407-415): prefix (exclusive) accumulators.
    m = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / jnp.where(depth_px == 0, 1.0, depth_px))
    m = jnp.where(depth_px == 0, 0.0, m)
    A_prefix = jnp.cumsum(w, axis=0) - w  # sum_{j<i} w_j = 1 - T_before (on included)
    M1_prefix = jnp.cumsum(w * m, axis=0) - w * m
    M2_prefix = jnp.cumsum(w * m * m, axis=0) - w * m * m
    # CUDA uses A = 1 - T (T before update) which equals sum of prior weights.
    distortion = jnp.sum(
        (m * m * A_prefix + M2_prefix - 2 * m * M1_prefix) * w, axis=0
    )

    final_T = jnp.prod(jnp.where(included, one_m, 1.0), axis=0)
    M1 = jnp.sum(w * m, axis=0)
    M2 = jnp.sum(w * m * m, axis=0)

    # Median depth: last included contribution while T_before > 0.5
    # (forward.cu:417-420).
    med_mask = included & (T_before > 0.5) & (w > 0)
    idx = jnp.arange(P, dtype=jnp.int32)[:, None, None]
    last_med = jnp.max(jnp.where(med_mask, idx, -1), axis=0)
    median_depth = jnp.where(
        last_med >= 0,
        jnp.take_along_axis(depth_px, jnp.maximum(last_med, 0)[None], axis=0)[0],
        0.0,
    )

    # Contributor bookkeeping: index within the pixel's tile list (1-based,
    # counting every examined gaussian in the tile, forward.cu:364,437).
    idx_in_list = jnp.cumsum(covered.astype(jnp.int32), axis=0)
    contributed = w > 0
    n_contrib = jnp.max(jnp.where(contributed, idx_in_list, 0), axis=0)
    median_contrib = jnp.max(jnp.where(med_mask, idx_in_list, -1), axis=0)

    out_color = render + final_T[..., None] * bg_color[None, None, :]

    return {
        "render": out_color,
        "feature": feature,
        "alpha": 1.0 - final_T,
        "depth": D,
        "median_depth": median_depth,
        "normal": normal,
        "distortion": distortion,
        "final_T": final_T,
        "M1": M1,
        "M2": M2,
        "n_contrib": n_contrib,
        "median_contrib": median_contrib,
        "radii": pre.radius,
        "mean2d": pre.mean2d,
    }
