"""Multi-view consistency machinery (reference train_refnerf.py:414-745
calc_warp_loss + scene/gaussian_model.py:1081-1116 depth helpers).

Static-shape JAX port: the variable-size valid-pixel subset becomes a fixed
`sample_num` random choice with zero weights on invalid samples (masked
means), so one jit covers every iteration.

Divergence (documented): the reference's edge mask uses cv2.Canny on the
rendered normal map (utils/image_utils.py:109, host-side, no-grad); here it
is a Sobel-magnitude threshold + max-pool dilation, stop-gradient'ed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.config import OptimizationParams
from materialrefgs_tpu.train.losses import lncc, spatial_gradient


def grid_sample(img: jax.Array, coords: jax.Array, align_corners: bool = True,
                padding_mode: str = "zeros"):
    """Bilinear sample. img (H, W, C); coords (..., 2) in [-1, 1] (x, y).
    Matches torch F.grid_sample(align_corners=True): default padding is
    ZEROS — out-of-bounds samples vanish (the warp's fg_ok min-mask relies
    on this to reject border-straddling patches like the reference)."""
    H, W = img.shape[:2]
    x, y = coords[..., 0], coords[..., 1]
    if align_corners:
        fx = (x + 1) * (W - 1) / 2
        fy = (y + 1) * (H - 1) / 2
    else:
        fx = ((x + 1) * W - 1) / 2
        fy = ((y + 1) * H - 1) / 2
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    wx = jnp.clip(fx - x0f, 0, 1)[..., None]
    wy = jnp.clip(fy - y0f, 0, 1)[..., None]

    def tap(yf, xf):
        ok = (xf >= 0) & (xf < W) & (yf >= 0) & (yf < H)
        xi = jnp.clip(xf, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, H - 1).astype(jnp.int32)
        v = img[yi, xi]
        if padding_mode == "zeros":
            v = v * ok[..., None]
        return v

    c00 = tap(y0f, x0f)
    c01 = tap(y0f, x0f + 1)
    c10 = tap(y0f + 1, x0f)
    c11 = tap(y0f + 1, x0f + 1)
    return (
        c00 * (1 - wx) * (1 - wy)
        + c01 * wx * (1 - wy)
        + c10 * (1 - wx) * wy
        + c11 * wx * wy
    )


def patch_offsets(h_patch_size: int):
    """(1, (2p+1)^2, 2) pixel offsets (utils/graphics_utils.py:230)."""
    r = jnp.arange(-h_patch_size, h_patch_size + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(r, r, indexing="xy")
    return jnp.stack([gx, gy], axis=-1).reshape(1, -1, 2)


def patch_warp(Hmat: jax.Array, uv: jax.Array):
    """Apply homographies: Hmat (B, 3, 3), uv (B, P, 2) pixel coords
    (utils/graphics_utils.py:234-244)."""
    ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
    homo = jnp.concatenate([uv, ones], axis=-1)
    out = jnp.einsum("bik,bpk->bpi", Hmat, homo)
    return out[..., :2] / (out[..., 2:3] + 1e-10)


def edges_mask_from_normal(normal_map: jax.Array, dilate_size: int = 7, thresh: float = 80.0 / 255.0):
    """(H, W, 3) -> (H, W) bool: True where NOT near a normal edge."""
    g = jax.lax.stop_gradient(normal_map)
    gray = jnp.mean(g, axis=-1, keepdims=True)
    grad = spatial_gradient(gray)  # (H, W, 1, 2)
    mag = jnp.sqrt(jnp.sum(grad**2, axis=-1))[..., 0] * 8.0  # unnormalize sobel
    edges = (mag > thresh).astype(jnp.float32)
    k = dilate_size
    dil = jax.lax.reduce_window(
        edges, -jnp.inf, jax.lax.max, (2 * k + 1, 2 * k + 1), (1, 1), "SAME"
    )
    return dil < 0.5


def points_from_depth(camera: Camera, depth: jax.Array) -> jax.Array:
    """(H, W) depth -> (H*W, 3) world points (gaussian_model.py:1104-1116)."""
    rays_d = camera.get_rays()  # camera-space, z=1
    pts_cam = (rays_d * depth[..., None]).reshape(-1, 3)
    # world_view[:3,:3] = R_w2c^T (row-vector); invert: world = (cam - T) @ R^T
    R = camera.world_view[:3, :3]  # x_cam = x_world @ R
    T = camera.world_view[3, :3]
    return (pts_cam - T) @ R.T


def points_depth_in_depth_map(camera: Camera, depth_map: jax.Array, pts_cam: jax.Array):
    """Bilinear-sample `depth_map` at the projections of pts_cam
    (gaussian_model.py:1081-1103). Returns (map_z (N,), in_bounds (N,))."""
    W, H = camera.width, camera.height
    px = pts_cam[:, 0] * camera.fx / pts_cam[:, 2] + camera.cx
    py = pts_cam[:, 1] * camera.fy / pts_cam[:, 2] + camera.cy
    mask = (px > 0) & (px < W) & (py > 0) & (py < H) & (pts_cam[:, 2] > 0.1)
    gx = px / ((W - 1) / 2) - 1
    gy = py / ((H - 1) / 2) - 1
    z = grid_sample(depth_map[..., None], jnp.stack([gx, gy], -1))[:, 0]
    return z, mask


class WarpLosses(NamedTuple):
    geo_loss: jax.Array
    ncc_loss: jax.Array
    base_color_loss: jax.Array
    metallic_warp_loss: jax.Array
    roughness_warp_loss: jax.Array
    weights_map: jax.Array  # (H, W) geometry-consistency weights


def robust_L(d: jax.Array, gamma: float = 0.2, delta: float = 5.0):
    """train_refnerf.py:641-645 robust penalty."""
    lo = (d / gamma) ** 3 * gamma
    hi = d + 1.0 / delta * (jnp.exp(delta * (d - gamma)) - 1.0)
    return jnp.where(d < gamma, lo, hi)


def calc_warp_loss(
    camera: Camera,
    nearest_camera: Camera,
    render_pkg: dict,
    nearest_pkg: dict,
    gt_gray: jax.Array,  # (H, W)
    nearest_gray: jax.Array,  # (H, W)
    image_mask: jax.Array,  # (H, W) foreground mask
    opt: OptimizationParams,
    iteration: jax.Array,
    key: jax.Array,
    use_ncc: bool = False,
) -> WarpLosses:
    """Geometry + homography-patch material warp losses
    (train_refnerf.py:414-745). All shapes static; invalid samples carry
    zero weight."""
    H, W = camera.height, camera.width
    patch_size = opt.multi_view_patch_size
    total_patch = (2 * patch_size + 1) ** 2
    sample_num = min(opt.multi_view_sample_num, H * W)
    it = jnp.asarray(iteration, jnp.float32)

    surf_depth = render_pkg["surf_depth"]  # (H, W)
    nearest_depth = nearest_pkg["surf_depth"]

    ix, iy = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(H, dtype=jnp.float32), indexing="xy"
    )
    pixels_all = jnp.stack([ix, iy], axis=-1).reshape(-1, 2)

    # Geometry reprojection consistency (train_refnerf.py:483-516).
    pts = points_from_depth(camera, surf_depth)
    Rn = nearest_camera.world_view[:3, :3]
    Tn = nearest_camera.world_view[3, :3]
    pts_near = pts @ Rn + Tn
    map_z, d_mask = points_depth_in_depth_map(nearest_camera, nearest_depth, pts_near)
    pts_near2 = pts_near / (pts_near[:, 2:3] + 1e-12) * map_z[:, None]
    pts_world2 = (pts_near2 - Tn) @ Rn.T
    pts_view = pts_world2 @ camera.world_view[:3, :3] + camera.world_view[3, :3]
    proj = jnp.stack(
        [
            pts_view[:, 0] * camera.fx / pts_view[:, 2] + camera.cx,
            pts_view[:, 1] * camera.fy / pts_view[:, 2] + camera.cy,
        ],
        axis=-1,
    )
    # NOT jnp.linalg.norm: its backward is inf*0=NaN at exact zeros, and a
    # perfectly-consistent pixel (proj == pixels) produces exactly that —
    # one NaN here poisons xyz/rotation/scaling/opacity gradients for every
    # splat the pixel touches (round-3 flagship collapse at warp onset:
    # 18k nonfinite grad entries in the FIRST warp iteration).
    dproj = proj - pixels_all
    pixel_noise = jnp.sqrt(jnp.sum(dproj * dproj, axis=-1) + 1e-12)
    if not opt.wo_use_geo_occ_aware:
        d_mask = d_mask & (pixel_noise < opt.multi_view_pixel_noise_th)
        weights = jax.lax.stop_gradient(1.0 / jnp.exp(pixel_noise))
    else:
        weights = jnp.ones_like(pixel_noise)
    weights = jnp.where(d_mask, weights, 0.0)

    n_valid = jnp.sum(d_mask)
    # geo_loss is computed by every reference trainer but APPLIED only by
    # refreal (train_refnerf.py:745 returns None for it; train_refreal.py:729
    # returns it and :1216 adds it). The gate is STRUCTURAL (Python-level):
    # a 0.0 weight would still trace the term and let any backward NaN
    # through as 0 * NaN.
    if opt.use_warp_geo_loss:
        geo_loss = opt.multi_view_geo_weight * jnp.sum(
            weights * pixel_noise
        ) / jnp.maximum(n_valid, 1)
    else:
        geo_loss = jnp.float32(0.0)

    # Random subset of valid pixels (static size).
    score = jnp.where(d_mask, jax.random.uniform(key, d_mask.shape), -1.0)
    _, idx = jax.lax.top_k(score, sample_num)
    sel_valid = d_mask[idx]
    w_sel = jax.lax.stop_gradient(weights[idx]) * sel_valid

    pixels = pixels_all[idx]  # (N, 2)
    offsets = patch_offsets(patch_size)  # (1, P, 2)
    ncc_scale = 1.0
    ori_patch = pixels[:, None, :] / ncc_scale + offsets  # (N, P, 2)

    def norm_coords(p):
        return jnp.stack(
            [2 * p[..., 0] / (W - 1) - 1, 2 * p[..., 1] / (H - 1) - 1], axis=-1
        )

    patch_ref = norm_coords(ori_patch)

    # Edge mask + background mask (train_refnerf.py:446-452, 620-636);
    # edge awareness is a config gate (opt.edge_aware_in_warp, :438).
    if opt.edge_aware_in_warp:
        edges_ok = edges_mask_from_normal(
            render_pkg["rend_normal"], dilate_size=opt.dilate_size
        ).reshape(-1)[idx]
    else:
        edges_ok = jnp.ones((sample_num,), bool)
    mask_val = grid_sample(image_mask[..., None], patch_ref.reshape(-1, 2)).reshape(
        sample_num, total_patch
    )
    fg_ok = jnp.min(mask_val, axis=-1) > 0.99
    bg_edge_ok = fg_ok & edges_ok

    # Homography ref -> nearest (train_refnerf.py:570-584).
    R_rel = nearest_camera.world_view[:3, :3].T @ camera.world_view[:3, :3]
    t_rel = -R_rel @ camera.world_view[3, :3] + nearest_camera.world_view[3, :3]
    local_n = (render_pkg["rend_normal"].reshape(-1, 3) @ camera.world_view[:3, :3])[idx]
    local_d = render_pkg["rend_distance"].reshape(-1)[idx]
    Hrel = R_rel[None] - jnp.einsum(
        "i,bj->bij", t_rel, local_n
    ) / jnp.maximum(local_d, 1e-8)[:, None, None]
    Hrel = jnp.einsum("ij,bjk->bik", nearest_camera.get_K(ncc_scale), Hrel)
    Hrel = jnp.einsum("bij,jk->bik", Hrel, camera.get_inv_K(ncc_scale))
    grid = patch_warp(Hrel, ori_patch)  # (N, P, 2)
    patch_near = norm_coords(grid)

    # NCC photometric patch loss — the refreal-only path
    # (get_consistency_loss2, train_refreal.py:358-396): gradients flow
    # through the WARP COORDINATES (homography <- normals/distance), and a
    # no-grad REFLECTIVITY GATE skips pixels whose mean metallic across the
    # two views >= 0.2 — multi-view photometric consistency is exactly what
    # reflections violate (the paper's premise), and NCC on reflective
    # pixels collapses geometry (round-3 flagship regression).
    ref_gray = grid_sample(gt_gray[..., None], patch_ref.reshape(-1, 2)).reshape(
        sample_num, total_patch
    )
    near_gray = grid_sample(nearest_gray[..., None], patch_near.reshape(-1, 2)).reshape(
        sample_num, total_patch
    )
    ncc_loss = jnp.float32(0.0)
    if use_ncc:
        refl_ref = grid_sample(
            jax.lax.stop_gradient(render_pkg["refl_strength_map"]),
            jax.lax.stop_gradient(patch_ref.reshape(-1, 2)),
        ).reshape(sample_num, total_patch).mean(axis=-1)
        refl_nst = grid_sample(
            jax.lax.stop_gradient(nearest_pkg["refl_strength_map"]),
            jax.lax.stop_gradient(patch_near.reshape(-1, 2)),
        ).reshape(sample_num, total_patch).mean(axis=-1)
        not_reflective = (refl_ref + refl_nst) < 0.4
        ncc, ncc_mask = lncc(ref_gray, near_gray)
        m = ncc_mask[:, 0] & sel_valid & not_reflective
        ncc_loss = opt.multi_view_ncc_weight * jnp.sum(
            jnp.where(m, ncc[:, 0] * w_sel, 0.0)
        ) / jnp.maximum(jnp.sum(m), 1)

    # Base-color warp (train_refnerf.py:535-548, 639, 696). Gradient-flow
    # contract: the CURRENT view's samples sit inside the reference's
    # torch.no_grad() block (train_refnerf.py:512-541) and the nearest
    # view's are taken at grid.detach() — so the warp pulls the NEAREST
    # view's rendered map toward the current view's DETACHED one, through
    # map values only (never through the homography).
    gate_bc = (it > opt.basecolor_warp_from_iter).astype(jnp.float32)

    def sample_map(mp, coords):
        return grid_sample(mp, coords.reshape(-1, 2)).reshape(
            sample_num, total_patch, -1
        )

    bc_ref = jax.lax.stop_gradient(
        sample_map(render_pkg["diffuse_map"], patch_ref)
    )
    bc_near = sample_map(nearest_pkg["diffuse_map"], jax.lax.stop_gradient(patch_near))
    bc_diff = jnp.mean(jnp.sum(jnp.abs(bc_ref - bc_near), axis=-1), axis=-1)
    base_color_loss = (
        gate_bc
        * 0.1  # get_current_basecolor_warp_weight
        * opt.multi_view_ncc_weight
        * jnp.sum(bc_diff * w_sel) / jnp.maximum(jnp.sum(sel_valid), 1)
    )

    # Directional metallic / roughness warp (train_refnerf.py:650-676);
    # opt.directional_rghmtl_warp_alignment=False falls back to plain
    # symmetric-difference alignment (:661-662, :675-676).
    def directional_warp(name, direction):
        # Same gradient contract as base color: the ref side is constant
        # (inside the reference's no_grad block), only the nearest view's
        # map values receive gradient.
        a = jax.lax.stop_gradient(
            sample_map(render_pkg[name], patch_ref)[..., 0]
        )
        b = sample_map(nearest_pkg[name], jax.lax.stop_gradient(patch_near))[..., 0]
        m = bg_edge_ok & sel_valid
        if not opt.directional_rghmtl_warp_alignment:
            l = jnp.mean(jnp.abs(a - b), axis=-1) * w_sel
            return jnp.sum(jnp.where(m, l, 0.0)) / jnp.maximum(jnp.sum(m), 1)
        tgt = jax.lax.stop_gradient(
            jnp.maximum(a, b) if direction == "max" else jnp.minimum(a, b)
        )
        vw = jnp.mean(tgt, axis=-1) if direction == "max" else 1.0
        l = vw * jnp.mean(jnp.abs(a - tgt), axis=-1) * w_sel
        l = l + vw * jnp.mean(jnp.abs(b - tgt), axis=-1) * w_sel
        return jnp.sum(jnp.where(m, robust_L(l), 0.0)) / jnp.maximum(jnp.sum(m), 1)

    metallic_warp_loss = jnp.float32(0.0)
    roughness_warp_loss = jnp.float32(0.0)
    # Metallic/roughness warps have their own start gate
    # (train_refnerf.py:1274-1277, opt.rghmtl_warp_loss_start_iter).
    gate_rm = gate_bc * (it > opt.rghmtl_warp_loss_start_iter).astype(jnp.float32)
    if opt.use_metallic_warp_loss:
        metallic_warp_loss = (
            gate_rm * 0.5 * opt.metallic_warp_weight
            * directional_warp("refl_strength_map", "max")
        )
    if opt.use_roughness_warp_loss:
        roughness_warp_loss = (
            gate_rm * 0.5 * opt.roughness_warp_weight
            * directional_warp("roughness_map", "min")
        )

    wmap = weights.reshape(H, W)
    return WarpLosses(
        geo_loss=geo_loss,
        ncc_loss=ncc_loss,
        base_color_loss=base_color_loss,
        metallic_warp_loss=metallic_warp_loss,
        roughness_warp_loss=roughness_warp_loss,
        weights_map=wmap,
    )


def mono_normal_loss(
    camera: Camera,
    surf_normal: jax.Array,  # (H, W, 3) world
    rend_normal: jax.Array,  # (H, W, 3) world
    normal_prior: jax.Array,  # (H, W, 3) camera-space prior (Metric3D)
    mask: jax.Array | None,  # (H, W)
):
    """Monocular normal prior loss (train_refnerf.py:202-251): rotate world
    normals into the camera frame, L1 + cosine against the prior."""
    # R.T rotates world->camera for normals; world_view[:3,:3] is that rotation
    # in row-vector form.
    R = camera.world_view[:3, :3]

    def one(normal):
        from materialrefgs_tpu.utils.transforms import normalize as _safe_norm

        n_cam = _safe_norm(normal.reshape(-1, 3) @ R)
        gt = _safe_norm(normal_prior.reshape(-1, 3))
        if mask is None:
            l1 = jnp.mean(jnp.sum(jnp.abs(n_cam - gt), axis=-1))
            cos = jnp.mean(1.0 - jnp.sum(n_cam * gt, axis=-1))
        else:
            m = mask.reshape(-1)
            denom = jnp.maximum(jnp.sum(m), 1)
            l1 = jnp.sum(jnp.sum(jnp.abs(n_cam - gt), axis=-1) * m) / denom
            cos = jnp.sum((1.0 - jnp.sum(n_cam * gt, axis=-1)) * m) / denom
        return l1, cos

    l1_s, cos_s = one(surf_normal)
    l1_r, cos_r = one(rend_normal)
    return l1_s, cos_s, l1_r, cos_r
