"""Reflection-score mining (train_refnerf.py:747-1010, @no_grad).

Per view: cache rendered normal/depth/distance maps for all train views,
build a wide neighbor set (20 neighbors, 5 deg < angle < 90 deg,
0.1 < dist < 1.5), then for each neighbor: depth-reprojection occlusion test
+ homography patch warp of the neighbor RGB, and score each pixel by the
mean absolute color difference across neighbors — "looks different across
views => reflective". Scores drive material supervision in the refreal
trainer (train_refreal.py:1237-1263).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.train import warp


def neighbor_graph_wide(
    cameras: list[Camera],
    R_list: list[np.ndarray],
    num: int = 20,
    min_angle: float = 5.0,
    max_angle: float = 90.0,
    min_dis: float = 0.1,
    max_dis: float = 1.5,
) -> list[list[int]]:
    """get_multi_view_neighbor (train_refnerf.py:747-788)."""
    centers = np.stack([np.asarray(c.camera_center) for c in cameras])
    rays = np.stack([R @ np.array([0.0, 0.0, 1.0]) for R in R_list])
    rays /= np.maximum(np.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    diss = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
    ang = np.arccos(np.clip(np.sum(rays[:, None] * rays[None], -1), -1, 1)) * 180 / 3.14159
    out = []
    for i in range(len(cameras)):
        order = np.lexsort((ang[i], diss[i]))
        m = (
            (ang[i][order] < max_angle)
            & (ang[i][order] > min_angle)
            & (diss[i][order] > min_dis)
            & (diss[i][order] < max_dis)
        )
        order = order[m]
        out.append(list(order[:num]))
    return out


@functools.partial(jax.jit, static_argnames=("patch_size",))
def _neighbor_warp(
    camera: Camera,
    nearest_camera: Camera,
    ref_depth,  # (H, W)
    ref_normal,  # (H, W, 3) world
    ref_distance,  # (H, W)
    nearest_depth,  # (H, W)
    nearest_rgb,  # (H, W, 3)
    pixel_noise_th: float,
    patch_size: int = 4,
):
    """One neighbor: occlusion-tested homography warp of its RGB into the ref
    view. Returns (d_mask (HW,), warped_rgb (HW, P, 3))."""
    H, W = camera.height, camera.width
    total_patch = (2 * patch_size + 1) ** 2

    pts = warp.points_from_depth(camera, ref_depth)
    Rn = nearest_camera.world_view[:3, :3]
    Tn = nearest_camera.world_view[3, :3]
    pts_near = pts @ Rn + Tn
    map_z, d_mask = warp.points_depth_in_depth_map(
        nearest_camera, nearest_depth, pts_near
    )
    pts_near2 = pts_near / (pts_near[:, 2:3] + 1e-12) * map_z[:, None]
    pts_world2 = (pts_near2 - Tn) @ Rn.T
    pts_view = pts_world2 @ camera.world_view[:3, :3] + camera.world_view[3, :3]
    ix, iy = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32), indexing="xy"
    )
    pixels = jnp.stack([ix, iy], -1).reshape(-1, 2)
    proj = jnp.stack(
        [
            pts_view[:, 0] * camera.fx / pts_view[:, 2] + camera.cx,
            pts_view[:, 1] * camera.fy / pts_view[:, 2] + camera.cy,
        ],
        -1,
    )
    noise = jnp.linalg.norm(proj - pixels, axis=-1)
    d_mask = d_mask & (noise < pixel_noise_th)

    offsets = warp.patch_offsets(patch_size)
    patches = pixels[:, None, :] + offsets  # (HW, P, 2)
    R_rel = Rn.T @ camera.world_view[:3, :3]
    t_rel = -R_rel @ camera.world_view[3, :3] + Tn
    local_n = ref_normal.reshape(-1, 3) @ camera.world_view[:3, :3]
    local_d = ref_distance.reshape(-1)
    Hmat = R_rel[None] - jnp.einsum("i,bj->bij", t_rel, local_n) / jnp.maximum(
        local_d, 1e-8
    )[:, None, None]
    Hmat = jnp.einsum("ij,bjk->bik", nearest_camera.get_K(), Hmat)
    Hmat = jnp.einsum("bij,jk->bik", Hmat, camera.get_inv_K())
    grid = warp.patch_warp(Hmat, patches)
    gn = jnp.stack(
        [2 * grid[..., 0] / (W - 1) - 1, 2 * grid[..., 1] / (H - 1) - 1], -1
    )
    rgb = warp.grid_sample(nearest_rgb, gn.reshape(-1, 2)).reshape(-1, total_patch, 3)
    rgb = jnp.where(d_mask[:, None, None], rgb, 0.0)
    return d_mask, rgb


def compute_ref_scores(
    cameras: list[Camera],
    images: list,  # (H, W, 3) arrays
    depth_maps: list,  # (H, W) cached surf_depth per view
    normal_maps: list,  # (H, W, 3) cached rend_normal per view
    distance_maps: list,  # (H, W) cached rend_distance per view
    neighbor_ids: list[list[int]],
    pixel_noise_th: float = 1.0,
    patch_size: int = 4,
) -> list[np.ndarray]:
    """Returns a per-view (H, W) reflection-score map (mean abs diff across
    occlusion-valid warped neighbors, train_refnerf.py:970-983)."""
    scores = []
    for i, cam in enumerate(cameras):
        H, W = cam.height, cam.width
        total_patch = (2 * patch_size + 1) ** 2
        # Anchor patches from the reference image itself.
        ix, iy = jnp.meshgrid(
            jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32),
            indexing="xy",
        )
        pixels = jnp.stack([ix, iy], -1).reshape(-1, 1, 2)
        patches = pixels + warp.patch_offsets(patch_size)
        pn = jnp.stack(
            [2 * patches[..., 0] / (W - 1) - 1, 2 * patches[..., 1] / (H - 1) - 1], -1
        )
        anchored = warp.grid_sample(jnp.asarray(images[i]), pn.reshape(-1, 2)).reshape(
            -1, total_patch, 3
        )

        diff_sum = jnp.zeros((H * W, total_patch, 3))
        mask_sum = jnp.zeros((H * W,))
        for j in neighbor_ids[i]:
            d_mask, rgb = _neighbor_warp(
                cam,
                cameras[j],
                jnp.asarray(depth_maps[i]),
                jnp.asarray(normal_maps[i]),
                jnp.asarray(distance_maps[i]),
                jnp.asarray(depth_maps[j]),
                jnp.asarray(images[j]),
                pixel_noise_th,
                patch_size,
            )
            diff = jnp.where(
                d_mask[:, None, None], jnp.abs(rgb - anchored), 0.0
            )
            diff_sum = diff_sum + diff
            mask_sum = mask_sum + d_mask.astype(jnp.float32)

        val_mean = diff_sum / (mask_sum[:, None, None] + 1e-8)
        score = jnp.where(
            mask_sum > 0, jnp.mean(jnp.sum(val_mean, -1), -1), 0.0
        )
        scores.append(np.asarray(score.reshape(H, W)))
    return scores
