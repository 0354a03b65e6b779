"""Forward render paths (reference gaussian_renderer/__init__.py).

  render_initial (ref :94)  — plain 2DGS RGB from SH, no materials.
  render_surfel  (ref :225) — deferred: rasterize base color + feature vector
      [refl, rough, ori_color(3), indirect(3), distance], then per-pixel
      split-sum shading; final = (1-refl)*base + specular, bg composited last.

All outputs channel-last (H, W, C). The PGSR-flavor "unbiased depth"
(allmap[7:8] of the non-vendored diff_surfel_rasterization2) is reconstructed
outside the kernel from the composited plane-distance and normal maps:
depth = dist / <n_view, K^-1 (u,v,1)> (PGSR plane-to-depth identity).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.models.env_light import EnvLightMips
from materialrefgs_tpu.models.gaussian_model import GaussianModel
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from materialrefgs_tpu.render import shading
from materialrefgs_tpu.utils import sh as sh_utils
from materialrefgs_tpu.utils.asg import eval_asg_indirect
from materialrefgs_tpu.utils.point import depth_to_normal
from materialrefgs_tpu.utils.transforms import (
    flip_align_view,
    linear_to_srgb,
    normalize,
    reflect,
)


@dataclass(frozen=True)
class RenderOptions:
    depth_ratio: float = 0.0  # 2DGS expected/median blend (pipe.depth_ratio)
    use_asg: bool = False  # ASG vs SH indirect (pipe.use_asg)
    unbiased_depth: bool = True  # PGSR flavor (arguments/config.py FLAG="pgsr")
    indirect: bool = False  # use visibility + indirect light in shading
    srgb: bool = False
    # "origin" (EnvGS trace via render_surfel2) or "raytracing_residual"
    # (mesh-traced one-bounce residual in render_surfel; the reference's
    # import-time INDIRECT_TYPE switch, arguments/config.py:2).
    indirect_type: str = "origin"
    raster: RasterizeConfig = RasterizeConfig()


def _gaussian_normals(pc: GaussianModel, camera: Camera):
    """World normals flipped toward the viewer (gaussian_model.py:268-284)."""
    dir_pp = normalize(pc.params.xyz - camera.camera_center[None, :])
    n_raw = pc.get_world_normal()
    n, _ = flip_align_view(n_raw, dir_pp)
    return normalize(n), dir_pp


def _local_distance(pc: GaussianModel, camera: Camera, normals: jax.Array):
    """Per-gaussian |<n_view, p_view>| plane distance
    (gaussian_renderer/__init__.py:32-40 get_distance)."""
    Rv = camera.world_view[:3, :3]
    local_n = normals @ Rv
    p_cam = pc.params.xyz @ Rv + camera.world_view[3, :3]
    return jnp.abs(jnp.sum(local_n * p_cam, axis=-1, keepdims=True))


def _indirect_light(pc: GaussianModel, camera: Camera, opts: RenderOptions):
    normals, dir_pp = _gaussian_normals(pc, camera)
    w_o = -dir_pp
    refl = reflect(w_o, normals)
    if opts.use_asg:
        indirect = eval_asg_indirect(pc.params.indirect_asg, normals, refl)
    else:
        shs = pc.get_indirect().transpose(0, 2, 1)  # (P, 3, K)
        indirect = jnp.maximum(
            sh_utils.eval_sh(pc.max_sh_degree, shs, normalize(refl)), 0.0
        )
    return indirect, normals


def _unpack_regularizations(out: dict, camera: Camera, opts: RenderOptions, rend_distance=None):
    """compute_2dgs_normal_and_regularizations (gaussian_renderer/__init__.py:42-90)."""
    render_alpha = out["alpha"][..., None]  # (H, W, 1)
    # Normal back to world space (kernel composites view-space normals).
    Rv = camera.world_view[:3, :3]
    render_normal = out["normal"] @ Rv.T

    depth_median = jnp.nan_to_num(out["median_depth"], nan=0.0)
    depth_expected = jnp.nan_to_num(
        out["depth"] / jnp.maximum(render_alpha[..., 0], 1e-12), nan=0.0
    )
    depth_expected = jnp.where(render_alpha[..., 0] > 0, depth_expected, 0.0)

    if opts.unbiased_depth and rend_distance is not None:
        # PGSR: per-pixel plane distance / <n_view, ray_cam>.
        rays_cam = camera.get_rays()  # (H, W, 3), z=1
        n_view = out["normal"]  # composited view-space normal (unnormalized)
        denom = jnp.abs(jnp.sum(n_view * rays_cam, axis=-1))
        surf_depth = jnp.where(
            denom > 1e-6, rend_distance[..., 0] / jnp.maximum(denom, 1e-6), 0.0
        )
        surf_depth = jnp.nan_to_num(surf_depth, nan=0.0)
    else:
        surf_depth = (
            depth_expected * (1 - opts.depth_ratio) + opts.depth_ratio * depth_median
        )

    surf_normal = depth_to_normal(camera, surf_depth)
    surf_normal = surf_normal * jax.lax.stop_gradient(render_alpha)

    return {
        "rend_alpha": render_alpha,
        "rend_normal": render_normal,
        "render_depth_median": depth_median,
        "render_depth_expected": depth_expected,
        "rend_dist": out["distortion"],
        "surf_depth": surf_depth,
        "surf_normal": surf_normal,
    }


def render_initial(
    pc: GaussianModel,
    camera: Camera,
    bg_color: jax.Array,
    opts: RenderOptions = RenderOptions(),
    mean2d_offset: jax.Array | None = None,
) -> dict:
    """Plain 2DGS render (gaussian_renderer/__init__.py:94-222)."""
    colors = pc.get_colors(camera.camera_center)
    feats = jnp.zeros((pc.capacity, 1), jnp.float32)
    out = rasterize(
        pc.params.xyz,
        pc.get_scaling,
        pc.get_rotation,
        pc.get_opacity[:, 0],
        colors,
        feats,
        camera,
        jnp.zeros(3, jnp.float32),
        config=opts.raster,
        mean2d_offset=mean2d_offset,
    )
    regs = _unpack_regularizations(out, camera, opts, None)
    image = out["render"]
    if opts.srgb:
        image = linear_to_srgb(image)
    image = image + bg_color[None, None, :] * (1 - regs["rend_alpha"])
    return {
        "render": image,
        "radii": out["radii"],
        "visibility_filter": out["radii"] > 0,
        "overflow": out["overflow"],
        **regs,
    }


def render_surfel(
    pc: GaussianModel,
    camera: Camera,
    bg_color: jax.Array,
    envmap: EnvLightMips,
    opts: RenderOptions = RenderOptions(),
    mean2d_offset: jax.Array | None = None,
    visibility: jax.Array | None = None,  # (H, W, 1) traced visibility
    traced_indirect: jax.Array | None = None,  # (H, W, 3) EnvGS indirect
    wo_render_img: bool = False,
    mesh=None,  # ops.mesh_tracer.MeshData: raytracing_residual branch
    mesh_cull_cap: int | None = None,
) -> dict:
    """Deferred-shading render (gaussian_renderer/__init__.py:225-520).

    With `mesh` and opts.indirect_type == "raytracing_residual", visibility
    and indirect light come from mesh_indirect_maps — the reference's
    INDIRECT_TYPE="raytracing_residual" compile flavor
    (arguments/config.py:2, utils/refl_utils.py:101-190) where the mesh
    tracer supplies a one-bounce residual instead of the EnvGS trace."""
    colors = pc.get_colors(camera.camera_center)
    refl = pc.get_refl
    rough = pc.get_rough
    ori_color = pc.get_ori_color
    indirect, normals = _indirect_light(pc, camera, opts)
    distance = _local_distance(pc, camera, normals)

    feats = jnp.concatenate([refl, rough, ori_color, indirect, distance], axis=-1)
    out = rasterize(
        pc.params.xyz,
        pc.get_scaling,
        pc.get_rotation,
        pc.get_opacity[:, 0],
        colors,
        feats,
        camera,
        jnp.zeros(3, jnp.float32),
        config=opts.raster,
        mean2d_offset=mean2d_offset,
    )

    f = out["feature"]
    refl_map = f[..., 0:1]
    rough_map = f[..., 1:2]
    albedo_map = f[..., 2:5]
    indirect_map = f[..., 5:8]
    dist_map = f[..., 8:9]
    base_color = out["render"]  # bg=0 inside

    regs = _unpack_regularizations(out, camera, opts, dist_map)
    render_alpha = regs["rend_alpha"]

    results = {
        "refl_strength_map": refl_map,
        "base_color_map": albedo_map,
        "roughness_map": rough_map,
        "rend_distance": dist_map,
        "radii": out["radii"],
        "visibility_filter": out["radii"] > 0,
        "overflow": out["overflow"],
        **regs,
    }
    if wo_render_img:
        # Geometry/material-only pass (no env shading, no mips needed):
        # everything the warp losses consume. diffuse_map is shading-free
        # ((1-m)*SH base color, render_surfel:446).
        results["diffuse_map"] = (1 - refl_map) * base_color
        return results

    # Deferred shading with the *world-space* normal map divided by alpha
    # (render_surfel:424-427). Visibility applies either with traced
    # indirect light (surfel contract, refl_utils.py:364-401) or alone
    # (surfel2 flavor: masks direct light only).
    normal_map = regs["rend_normal"] / jnp.maximum(render_alpha, 1e-6)
    use_indirect = opts.indirect
    if mesh is not None and opts.indirect_type == "raytracing_residual":
        maps = mesh_indirect_maps(
            mesh, camera, normal_map, regs["surf_depth"][..., None], envmap,
            render_alpha, cull_cap=mesh_cull_cap,
        )
        visibility = maps["visibility"]
        traced_indirect = maps["indirect"]
        results["mesh_cull_dropped"] = maps["cull_dropped"]
        use_indirect = True  # the residual branch IS the indirect term
    specular, extra = shading.specular_color_surfel(
        envmap,
        albedo_map,
        camera,
        normal_map,
        render_alpha,
        refl_map,
        rough_map,
        visibility=visibility,
        indirect_light=(
            (traced_indirect if traced_indirect is not None else indirect_map)
            if use_indirect
            else None
        ),
    )

    final = (1 - refl_map) * base_color + specular
    albedo_out = albedo_map
    if opts.srgb:
        final = linear_to_srgb(final)
        albedo_out = linear_to_srgb(albedo_map)
        specular = linear_to_srgb(specular)
    final = final + bg_color[None, None, :] * (1 - render_alpha)

    results.update(
        {
            "render": final,
            "diffuse_map": (1 - refl_map) * base_color,
            "diffuse_map_ori": base_color,
            "specular_map": specular,
            "base_color_map": albedo_out,
            "indirect_map": indirect_map,
            **extra,
        }
    )
    if opts.indirect and "indirect_color" in extra:
        ic = (1 - refl_map) * base_color + extra["indirect_color"]
        results["indirect_color"] = ic + bg_color[None, None, :] * (1 - render_alpha)
    return results


def render_volume(
    pc: GaussianModel,
    camera: Camera,
    bg_color: jax.Array,
    envmap: EnvLightMips,
    opts: RenderOptions = RenderOptions(),
    mean2d_offset: jax.Array | None = None,
) -> dict:
    """Forward (per-gaussian) shading then rasterize
    (gaussian_renderer/__init__.py:521+ render_volume)."""
    normals, dir_pp = _gaussian_normals(pc, camera)
    diffuse, specular, _ = shading.full_color_volume(
        envmap,
        pc.params.xyz,
        pc.get_ori_color,
        camera,
        normals,
        pc.get_refl,
        pc.get_rough,
    )
    colors = diffuse + specular
    feats = jnp.concatenate([pc.get_refl, pc.get_rough, pc.get_ori_color], axis=-1)
    out = rasterize(
        pc.params.xyz,
        pc.get_scaling,
        pc.get_rotation,
        pc.get_opacity[:, 0],
        colors,
        feats,
        camera,
        jnp.zeros(3, jnp.float32),
        config=opts.raster,
        mean2d_offset=mean2d_offset,
    )
    regs = _unpack_regularizations(out, camera, opts, None)
    image = out["render"]
    if opts.srgb:
        image = linear_to_srgb(image)
    image = image + bg_color[None, None, :] * (1 - regs["rend_alpha"])
    return {
        "render": image,
        "refl_strength_map": out["feature"][..., 0:1],
        "roughness_map": out["feature"][..., 1:2],
        "base_color_map": out["feature"][..., 2:5],
        "radii": out["radii"],
        "visibility_filter": out["radii"] > 0,
        "overflow": out["overflow"],
        **regs,
    }


def mesh_visibility_map(
    mesh,  # ops.mesh_tracer.MeshData
    camera: Camera,
    normal_map: jax.Array,  # (H, W, 3) alpha-divided world normal
    surf_depth: jax.Array,  # (H, W) or (H, W, 1)
    render_alpha: jax.Array | None = None,
    cull_cap: int | None = None,
    with_dropped: bool = False,
):
    """Mesh-traced specular visibility (refl_utils.py:319-330, :381-392):
    reflect camera rays at the unbiased-depth surface, nearest-hit the
    extracted mesh, vis = miss (depth >= 10). Non-differentiable in the
    reference (ray tracer has no grads) — stop_gradient keeps parity and
    spares the backward trace.

    with_dropped=True also returns the trace's cull_dropped counter; a
    nonzero value means occluder clusters beyond cull_cap were ignored and
    the caller should escalate (trainer does, like pair overflow)."""
    from materialrefgs_tpu.ops import mesh_tracer as mt

    if surf_depth.ndim == 2:
        surf_depth = surf_depth[..., None]
    rays_d, rays_o = shading.camera_rays_world(camera, unnormalized=True)
    surf_points = rays_o[None, None, :] + surf_depth * rays_d
    w_o = -normalize(rays_d)
    refl_dir = normalize(reflect(w_o, normal_map))
    # Trace in 16x16 tile bundles: spatially-coherent 256-ray blocks cull
    # more clusters than row-major blocks, and whole background tiles are
    # skipped via the alpha block mask (the reference traces only
    # render_alpha > 0 pixels, refl_utils.py:319-330 mask= indexing).
    from materialrefgs_tpu.render.envgs import (
        bundle_alpha_mask, bundles_to_image, rays_to_bundles,
    )

    H, W = camera.height, camera.width
    ro_b = rays_to_bundles(jax.lax.stop_gradient(surf_points), H, W)
    rd_b = rays_to_bundles(jax.lax.stop_gradient(refl_dir), H, W)
    mask_b = bundle_alpha_mask(render_alpha, H, W) if render_alpha is not None else None
    hit = mt.trace(mesh, ro_b, rd_b, cull_cap=cull_cap, block_mask=mask_b)
    vis_b = (hit["depth"] >= mt.T_FAR).astype(jnp.float32)[:, None]
    vis = bundles_to_image(vis_b, H, W)
    if render_alpha is not None:
        vis = jnp.where(render_alpha <= 0.0, 1.0, vis)
    if with_dropped:
        return vis, hit["cull_dropped"]
    return vis


def mesh_indirect_maps(
    mesh,  # ops.mesh_tracer.MeshData (built from the extracted TSDF mesh)
    camera: Camera,
    normal_map: jax.Array,  # (H, W, 3) world-space, alpha-divided
    surf_depth: jax.Array,  # (H, W, 1) unbiased surface depth
    envmap: EnvLightMips,
    render_alpha: jax.Array | None = None,  # (H, W, 1) gate for empty pixels
    cull_cap: int | None = None,
) -> dict:
    """Per-pixel mesh-traced visibility + one-bounce indirect light.

    TPU-native replacement for the reference's raytracing_residual shading
    branch (utils/refl_utils.py:101-190): surface points come from the
    rasterized unbiased depth (the rend_surf_points=False variant,
    refl_utils.py:131), reflected rays are traced against the extracted mesh,
    and occluded pixels receive the one-bounce split-sum color
    (raytracing_brdf/raytracer.py:274-300 shade).

    Returns {"visibility": (H, W, 1), "indirect": (H, W, 3), "cull_dropped"}
    — consumed by render_surfel(mesh=...) when opts.indirect_type ==
    "raytracing_residual" (or feed visibility/traced_indirect manually).
    """
    from materialrefgs_tpu.ops import mesh_tracer as mt

    rays_d, rays_o = shading.camera_rays_world(camera, unnormalized=True)
    surf_points = rays_o[None, None, :] + surf_depth * rays_d
    w_o = -normalize(rays_d)
    # The reference ray tracer is non-differentiable; stop_gradient keeps
    # parity AND spares saving residuals for the whole Moller-Trumbore
    # sweep (mesh_visibility_map does the same).
    out = mt.shade_one_bounce(
        mesh, envmap,
        jax.lax.stop_gradient(surf_points),
        jax.lax.stop_gradient(normal_map),
        jax.lax.stop_gradient(w_o),
        cull_cap=cull_cap,
    )
    vis, indirect = out["visibility"], out["indirect"]
    if render_alpha is not None:
        # Empty pixels: fully visible, no indirect (refl_utils.py:118-125
        # only traces where render_alpha > 0).
        empty = render_alpha <= 0.0
        vis = jnp.where(empty, 1.0, vis)
        indirect = jnp.where(empty, 0.0, indirect)
    return {
        "visibility": vis,
        "indirect": indirect,
        "cull_dropped": out["cull_dropped"],
    }
