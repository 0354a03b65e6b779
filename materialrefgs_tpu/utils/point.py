"""Depth map -> point cloud / pseudo-normals (reference utils/point_utils.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from materialrefgs_tpu.cameras import Camera


def depths_to_points(camera: Camera, depthmap: jax.Array) -> jax.Array:
    """(H, W) depth -> (H, W, 3) world points (point_utils.py:9-24).

    Uses the reference's intrinsics derivation (ndc2pix with W/2 offset — note
    this intentionally differs by half a pixel from the rasterizer's
    (W-1)/2 convention, as in the original)."""
    H, W = camera.height, camera.width
    c2w = jnp.linalg.inv(camera.world_view.T)
    ndc2pix = jnp.array(
        [[W / 2, 0, 0, W / 2], [0, H / 2, 0, H / 2], [0, 0, 0, 1.0]],
        jnp.float32,
    ).T  # (4, 3)
    projection = c2w.T @ camera.full_proj
    intrins = (projection @ ndc2pix)[:3, :3].T
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    pts = jnp.stack(
        [jnp.broadcast_to(gx, (H, W)), jnp.broadcast_to(gy, (H, W)), jnp.ones((H, W))],
        axis=-1,
    )
    rays_d = pts @ jnp.linalg.inv(intrins).T @ c2w[:3, :3].T
    rays_o = c2w[:3, 3]
    return depthmap[..., None] * rays_d + rays_o


def depth_to_normal(camera: Camera, depthmap: jax.Array) -> jax.Array:
    """(H, W) depth -> (H, W, 3) normals from cross of finite differences
    (point_utils.py:26-40); border pixels are zero."""
    points = depths_to_points(camera, depthmap)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # Grad-safe normalize: see utils.transforms.normalize (zero cross
    # products at flat/background pixels otherwise NaN the backward).
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    n = n * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    out = jnp.zeros_like(points)
    return out.at[1:-1, 1:-1].set(n)
