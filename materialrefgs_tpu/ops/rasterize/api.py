"""Public rasterization API: preprocess + binning + Pallas tile kernels.

Pipeline (TPU-native redesign of rasterize_points.cu + rasterizer_impl.cu):
  1. preprocess (pure jnp, vmapped over P)      — cull, transmat, AABB
  2. depth argsort over gaussians (P)           — replaces radix depth keys
  3. pair expansion + stable tile sort (B)      — replaces duplicateWithKeys
  4. _render_pairs custom VJP                   — gather + Pallas tile kernels
  5. unpack per-tile outputs to (H, W, *) maps

Step 4 keeps the payload gather and the kernels under ONE custom-VJP
boundary: forward is a single row gather from the (C, P) table (tile ranges
are raw; kernels over-read the enclosing 128-aligned window and mask), and
backward reduces the kernel's chunk-major per-pair gradients per-gaussian
with one XLA scatter-add keyed by the gid row the kernel stamps (replacing
CUDA atomics, backward.cu:446-468). No padded slot layout, slot<->sorted
indirection, or B-sized binning scatter exists anywhere.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.ops.rasterize import binning
from materialrefgs_tpu.ops.rasterize.layout import (
    K_CHUNK,
    PIX,
    TILE,
    out_layout,
    payload_channels_padded,
)
from materialrefgs_tpu.ops.rasterize.pallas_bwd import rasterize_tiles_bwd
from materialrefgs_tpu.ops.rasterize.pallas_fwd import rasterize_tiles_fwd
from materialrefgs_tpu.ops.rasterize.preprocess import PreprocessOut, preprocess


@dataclass(frozen=True)
class RasterizeConfig:
    pair_capacity: int = 1 << 20
    interpret: bool = False  # run Pallas kernels in interpreter mode (CPU tests)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _permute(x, order, inv_order):
    return x[order]


def _permute_fwd(x, order, inv_order):
    return x[order], inv_order


def _permute_bwd(inv_order, g):
    # VJP of a permutation gather is the inverse-permutation GATHER. XLA's
    # default transpose (scatter) costs ~70 ns/index on TPU — 10+ ms per
    # P-sized tensor tree — while this gather is bandwidth-bound (<1 ms).
    return g[inv_order], None, None


_permute.defvjp(_permute_fwd, _permute_bwd)


def _gather_pairs(payload_g, bins):
    """(C_PAD, B + 2K) sorted-pair payload columns via ONE bandwidth-bound
    row gather from the small (C_PAD, P) per-gaussian table. Invalid pairs
    (tile sentinel, sorted to the end) point at column 0; no tile range ever
    covers them, so they need no masking. The 2*K_CHUNK zero columns let the
    kernels' one-ahead DMA prefetch of the last over-read window stay in
    bounds."""
    pp = payload_g[:, bins.g_sorted]
    return jnp.concatenate(
        [pp, jnp.zeros((pp.shape[0], 2 * K_CHUNK), pp.dtype)], axis=1
    )


def _build_payload(pre: PreprocessOut, opacities, colors, features, S: int):
    """(C_PAD, P) per-gaussian payload columns (already depth-sorted).

    Row layout.row_gid(S) carries (own index + 1) as f32; it rides the pair
    row-gather for free and lets the backward kernel key its chunk-major
    gradient output for the caller's scatter-add."""
    C_PAD = payload_channels_padded(S)
    P = opacities.shape[0]
    cols = [
        pre.T_rows[:, 0, :],  # Tu (P,3)
        pre.T_rows[:, 1, :],
        pre.T_rows[:, 2, :],
        pre.mean2d,  # (P,2)
        opacities[:, None],
        colors,
        features,
        pre.normal,
        jax.lax.stop_gradient(jnp.arange(1, P + 1, dtype=jnp.float32))[:, None],
    ]
    pay = jnp.concatenate(cols, axis=-1)  # (P, C)
    pad = C_PAD - pay.shape[-1]
    if pad:
        pay = jnp.concatenate([pay, jnp.zeros((pay.shape[0], pad), pay.dtype)], -1)
    return pay.T  # (C_PAD, P)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _render_pairs(S, grid_x, grid_y, W, H, interpret, payload_g, bins):
    """Pair gather + Pallas tile kernels under ONE custom-VJP boundary, so
    no sorted-pair cotangent is ever materialized: the backward kernel emits
    chunk-major per-pair gradients with the owning gaussian id riding
    row_gid, and a single XLA scatter-add (~17 ns/index on v5e, the CUDA
    atomicAdd analog, backward.cu:446-468) reduces them per-gaussian."""
    pp = _gather_pairs(payload_g, bins)
    return rasterize_tiles_fwd(
        pp,
        bins.tile_start,
        bins.tile_count,
        S=S,
        grid_x=grid_x,
        grid_y=grid_y,
        W=W,
        H=H,
        interpret=interpret,
    )


def _render_pairs_fwd(S, grid_x, grid_y, W, H, interpret, payload_g, bins):
    pp = _gather_pairs(payload_g, bins)
    out = rasterize_tiles_fwd(
        pp,
        bins.tile_start,
        bins.tile_count,
        S=S,
        grid_x=grid_x,
        grid_y=grid_y,
        W=W,
        H=H,
        interpret=interpret,
    )
    return out, (pp, bins, out, payload_g.shape[1])


def _render_pairs_bwd(S, grid_x, grid_y, W, H, interpret, res, g):
    from materialrefgs_tpu.ops.rasterize.layout import row_gid

    pp, bins, fwd_out, P = res
    lay = out_layout(S)
    n_contrib = fwd_out[..., lay["n_contrib"][0]]  # (T, 256)
    tile_active = jnp.max(n_contrib, axis=1).astype(jnp.int32)
    d_ch = rasterize_tiles_bwd(
        pp,
        bins.tile_start,
        bins.tile_count,
        tile_active,
        bins.chunk_base,
        fwd_out,
        g,
        S=S,
        grid_x=grid_x,
        grid_y=grid_y,
        W=W,
        H=H,
        interpret=interpret,
    )
    GID = row_gid(S)
    # Chunk slots at/past chunk_base[T] were never written (HBM garbage),
    # and written-but-invalid lanes carry gid 0: route both to the
    # out-of-range sentinel P. (NB: the sentinel must be HIGH — negative
    # scatter indices wrap NumPy-style before mode="drop" applies.)
    col = jnp.arange(d_ch.shape[1], dtype=jnp.int32)
    live = col < bins.chunk_base[-1] * K_CHUNK
    raw = d_ch[GID].astype(jnp.int32) - 1
    idx = jnp.where(live & (raw >= 0), raw, P)
    dpg = jnp.zeros((d_ch.shape[0], P), d_ch.dtype).at[:, idx].add(
        d_ch, mode="drop"
    )
    dpg = dpg.at[GID].set(0.0)  # the gid row itself carries no gradient
    return dpg, None


_render_pairs.defvjp(_render_pairs_fwd, _render_pairs_bwd)


def _unpack(tiles_out, S, grid_x, grid_y, W, H, bg_color):
    layout = out_layout(S)
    C_OUT = tiles_out.shape[-1]
    img = tiles_out.reshape(grid_y, grid_x, TILE, TILE, C_OUT)
    img = img.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, C_OUT)
    img = img[:H, :W]

    def ch(name):
        a, b = layout[name]
        v = img[..., a:b]
        return v[..., 0] if b - a == 1 else v

    final_T = ch("final_T")
    return {
        "render": ch("color") + final_T[..., None] * bg_color[None, None, :],
        "feature": ch("feature"),
        "normal": ch("normal"),
        "depth": ch("depth"),
        "M1": ch("M1"),
        "M2": ch("M2"),
        "distortion": ch("distortion"),
        "median_depth": ch("median_depth"),
        "final_T": final_T,
        "alpha": 1.0 - final_T,
        "n_contrib": jax.lax.stop_gradient(ch("n_contrib")).astype(jnp.int32),
        "median_contrib": jax.lax.stop_gradient(ch("median_contrib")).astype(jnp.int32),
    }


def rasterize(
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
    mean2d_offset: jax.Array | None = None,
) -> dict:
    """Full differentiable rasterization; returns dict of (H, W, *) maps plus
    per-gaussian 'radii' and screen-space 'mean2d' (for densification stats).

    mean2d_offset (P, 2): zeros tensor whose gradient is the screen-space
    mean2D gradient (the reference's screenspace_points trick,
    gaussian_renderer/__init__.py:229-233) — used for densification stats."""
    H, W = camera.height, camera.width
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    S = features.shape[-1]

    pre = preprocess(means3d, scales, rotations, camera, scale_modifier)
    if mean2d_offset is not None:
        # Screen-space translation probe (the reference's screenspace_points
        # trick). mean2d feeds only the low-pass (2D) branch of the per-pixel
        # test, so shifting it alone captures no gradient for splats on the
        # ray-splat (3D) branch. A +delta screen shift of the 3D homography is
        # exactly Tu += dx*Tw, Tv += dy*Tw (k = (px-dx)*Tw - Tu), so the
        # offset's gradient is the full pixel-unit screen-translation grad of
        # BOTH branches — the signal densify_grad_threshold is calibrated for.
        dx = mean2d_offset[:, 0:1]
        dy = mean2d_offset[:, 1:2]
        T = pre.T_rows
        T = T.at[:, 0, :].add(dx * T[:, 2, :])
        T = T.at[:, 1, :].add(dy * T[:, 2, :])
        pre = pre._replace(mean2d=pre.mean2d + mean2d_offset, T_rows=T)
    # Gaussians with opacity < 1/255 can never pass the per-pixel alpha test
    # (forward.cu:397); cull them here so dead fixed-capacity slots cost no
    # binning pairs.
    active = opacities >= (1.0 / 255.0)
    valid = pre.valid & active
    pre = pre._replace(
        valid=valid,
        tiles_touched=jnp.where(valid, pre.tiles_touched, 0),
        radius=jnp.where(valid, pre.radius, 0.0),
    )

    # Depth sort over gaussians (stable, matches CUDA radix tie behavior).
    order = jnp.argsort(pre.depth, stable=True)
    inv_order = jnp.argsort(order)  # rank of each gaussian in depth order

    def sort_by_depth(a):
        # Integer/bool fields have no tangents; plain gather avoids pushing
        # float0 cotangents through the custom permute VJP.
        if not jnp.issubdtype(a.dtype, jnp.floating):
            return a[order]
        return _permute(a, order, inv_order)

    pre_s = jax.tree_util.tree_map(sort_by_depth, pre)
    opac_s = _permute(opacities, order, inv_order)
    colors_s = _permute(colors, order, inv_order)
    feats_s = _permute(features, order, inv_order)

    bins = binning.bin_pairs(
        pre_s, grid_x, grid_y, config.pair_capacity, opacities=opac_s
    )

    payload_g = _build_payload(pre_s, opac_s, colors_s, feats_s, S)  # (C, P)
    tiles_out = _render_pairs(
        S, grid_x, grid_y, W, H, config.interpret, payload_g, bins
    )
    out = _unpack(tiles_out, S, grid_x, grid_y, W, H, bg_color)
    out["radii"] = pre.radius
    out["mean2d"] = pre.mean2d
    out["overflow"] = bins.overflow
    return out
