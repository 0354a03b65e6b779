"""Per-Gaussian preprocessing for the 2D surfel rasterizer (pure JAX).

Vectorized re-derivation of preprocessCUDA
(submodules/diff-surfel-rasterization/cuda_rasterizer/forward.cu:164-266):
frustum cull, splat->pixel homography ("transmat"), view-space normal with
dual-visible flip, screen AABB and tile rect, SH->RGB.

Convention note: the CUDA code builds T with glm column-major matrices from
row-major torch arrays; unrolled into row-vector convention the transmat rows
are  T_rows = Npix^T @ P_full^T @ Hsplat,  where
  Hsplat (4x3) columns = [sx*tu; 0], [sy*tv; 0], [p; 1]
  P_full = camera.full_proj (transposed torch convention)
  Npix^T (3x4) = [[W/2,0,0,(W-1)/2],[0,H/2,0,(H-1)/2],[0,0,0,1]]
so that T_rows @ (u, v, 1)^T = (pix_x*w, pix_y*w, w) with w = view-space z.
Rows are (Tu, Tv, Tw) exactly as used in renderCUDA (forward.cu:366-382).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.utils.transforms import quat_to_rotmat

from materialrefgs_tpu.ops.rasterize.layout import (  # single source
    CUTOFF,
    FAR_N,
    FILTER_INV_SQUARE,
    NEAR_N,
    TILE,
)


class PreprocessOut(NamedTuple):
    T_rows: jax.Array  # (P, 3, 3) rows = Tu, Tv, Tw
    normal: jax.Array  # (P, 3) view-space normal (dual-visible flipped)
    depth: jax.Array  # (P,) view-space z of the splat center
    mean2d: jax.Array  # (P, 2) screen-space AABB center ("point_image")
    radius: jax.Array  # (P,) float radius in pixels (ceil applied)
    rect_min: jax.Array  # (P, 2) int32 tile rect (x, y), inclusive
    rect_max: jax.Array  # (P, 2) int32 tile rect (x, y), exclusive
    tiles_touched: jax.Array  # (P,) int32
    valid: jax.Array  # (P,) bool — survives culling


def compute_transmat(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    camera: Camera,
    scale_modifier: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Returns (T_rows (P,3,3), world_normal (P,3)). forward.cu:77-125."""
    R = quat_to_rotmat(rotations)  # (P, 3, 3); columns are tu, tv, tw
    tu = R[..., :, 0] * (scales[..., 0:1] * scale_modifier)
    tv = R[..., :, 1] * (scales[..., 1:2] * scale_modifier)
    tw = R[..., :, 2]  # unit normal (S[2][2] == 1 in scale_to_mat)

    W, H = camera.width, camera.height
    # Hsplat columns: [tu*sx; 0], [tv*sy; 0], [p; 1]  -> (P, 4, 3)
    zeros = jnp.zeros_like(tu[..., :1])
    ones = jnp.ones_like(tu[..., :1])
    Hsplat = jnp.stack(
        [
            jnp.concatenate([tu, zeros], axis=-1),
            jnp.concatenate([tv, zeros], axis=-1),
            jnp.concatenate([means3d, ones], axis=-1),
        ],
        axis=-1,
    )  # (P, 4, 3)
    Npix_T = jnp.array(
        [
            [W / 2.0, 0, 0, (W - 1) / 2.0],
            [0, H / 2.0, 0, (H - 1) / 2.0],
            [0, 0, 0, 1.0],
        ],
        dtype=jnp.float32,
    )  # (3, 4)
    M = Npix_T @ camera.full_proj.T  # (3, 4)
    T_rows = jnp.einsum(
        "ij,pjk->pik", M, Hsplat, precision=jax.lax.Precision.HIGHEST
    )  # (P, 3, 3)
    return T_rows, tw


def compute_aabb(T_rows: jax.Array, cutoff: float = CUTOFF):
    """forward.cu:129-159. Returns (center (P,2), extent (P,2), ok (P,))."""
    Tu, Tv, Tw = T_rows[..., 0, :], T_rows[..., 1, :], T_rows[..., 2, :]
    temp_point = jnp.array([cutoff * cutoff, cutoff * cutoff, -1.0], jnp.float32)
    distance = jnp.sum(Tw * Tw * temp_point, axis=-1)
    ok = distance != 0.0
    f = temp_point / jnp.where(ok, distance, 1.0)[..., None]
    center = jnp.stack(
        [jnp.sum(f * Tu * Tw, axis=-1), jnp.sum(f * Tv * Tw, axis=-1)], axis=-1
    )
    temp = jnp.stack(
        [jnp.sum(f * Tu * Tu, axis=-1), jnp.sum(f * Tv * Tv, axis=-1)], axis=-1
    )
    half_extend = center * center - temp
    extent = jnp.sqrt(jnp.maximum(half_extend, 1e-4))
    return center, extent, ok


def get_rect(center: jax.Array, radius: jax.Array, grid_x: int, grid_y: int):
    """auxiliary.h getRect: tile rect [rect_min, rect_max) per Gaussian."""
    gmin = jnp.stack(
        [
            jnp.trunc((center[..., 0] - radius) / TILE),
            jnp.trunc((center[..., 1] - radius) / TILE),
        ],
        axis=-1,
    )
    gmax = jnp.stack(
        [
            jnp.trunc((center[..., 0] + radius + TILE - 1) / TILE),
            jnp.trunc((center[..., 1] + radius + TILE - 1) / TILE),
        ],
        axis=-1,
    )
    lim = jnp.array([grid_x, grid_y], jnp.float32)
    rect_min = jnp.clip(gmin, 0, lim).astype(jnp.int32)
    rect_max = jnp.clip(gmax, 0, lim).astype(jnp.int32)
    return rect_min, rect_max


def preprocess(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    camera: Camera,
    scale_modifier: float = 1.0,
) -> PreprocessOut:
    P = means3d.shape[0]
    W, H = camera.width, camera.height
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    # Frustum cull (auxiliary.h:192): view-space z must exceed NEAR_N.
    ones = jnp.ones((P, 1), means3d.dtype)
    p_view = jnp.concatenate([means3d, ones], axis=-1) @ camera.world_view
    depth = p_view[..., 2]
    in_front = depth > NEAR_N

    T_rows, world_normal = compute_transmat(
        means3d, scales, rotations, camera, scale_modifier
    )

    # View-space normal + dual-visible flip (forward.cu:224-229).
    normal_view = world_normal @ camera.world_view[:3, :3]
    cos = -jnp.sum(p_view[..., :3] * normal_view, axis=-1)
    normal_view = jnp.where((cos > 0)[..., None], normal_view, -normal_view)
    cos_ok = cos != 0.0

    center, extent, aabb_ok = compute_aabb(T_rows, CUTOFF)
    # NOTE: like the CUDA reference (forward.cu:245), the rect radius is the
    # 3-sigma projected extent with NO low-pass-filter floor — the 2D
    # (rho2d) footprint of sub-pixel splats can exceed the rect and is
    # clipped at tile boundaries. Kept intentionally: the kernel, the jnp
    # reference, and the CUDA original all share this contract.
    radius = jnp.ceil(jnp.maximum(extent[..., 0], extent[..., 1]))
    rect_min, rect_max = get_rect(center, radius, grid_x, grid_y)
    nxy = jnp.maximum(rect_max - rect_min, 0)
    tiles = nxy[..., 0] * nxy[..., 1]

    valid = in_front & cos_ok & aabb_ok & (tiles > 0)
    tiles = jnp.where(valid, tiles, 0)
    return PreprocessOut(
        T_rows=T_rows,
        normal=normal_view,
        depth=depth,
        mean2d=center,
        radius=jnp.where(valid, radius, 0.0),
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles.astype(jnp.int32),
        valid=valid,
    )
