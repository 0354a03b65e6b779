"""EnvGS composite rendering (reference gaussian_renderer/envgs_renderer.py).

render_surfel2 (ref :461): deferred surfel render with an extra blend_weight
feature channel, reflected-ray tracing into the environment gaussians
(render_indirect, ref :716), and split-sum shading where traced indirect
light replaces env light in occluded directions (get_specular_color_surfel4).

Visibility: the reference uses a BVH mesh tracer (miss-depth sentinel 10);
TPU-natively we trace the MAIN gaussian cloud with the same bundle tracer and
use vis = 1 - acc (soft splat visibility). Documented divergence — the mesh
path's role (is the reflected ray blocked by the object itself?) is identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.models.env_light import EnvLightMips
from materialrefgs_tpu.models.gaussian_model import GaussianModel
from materialrefgs_tpu.ops.rasterize.api import rasterize
from materialrefgs_tpu.ops.tracer.api import TracerConfig, trace
from materialrefgs_tpu.render import shading
from materialrefgs_tpu.render.renderers import (
    RenderOptions,
    _gaussian_normals,
    _indirect_light,
    _local_distance,
    _unpack_regularizations,
)
from materialrefgs_tpu.utils.transforms import linear_to_srgb, normalize, reflect

TILE = 16


def rays_to_bundles(x: jax.Array, H: int, W: int):
    """(H, W, C) -> (NB*256, C) in 16x16 tile bundle order (padded).

    Edge padding replicates border rays: zero padding would give edge
    bundles degenerate cone stats (zero directions -> cosm clipped ->
    tan(theta)~1e3, origin at world 0 -> huge r0) that defeat cone culling
    and blow the cluster-pair budget on every non-multiple-of-16 image."""
    gy, gx = (H + TILE - 1) // TILE, (W + TILE - 1) // TILE
    pad_h, pad_w = gy * TILE - H, gx * TILE - W
    xp = jnp.pad(x, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    xb = xp.reshape(gy, TILE, gx, TILE, -1).transpose(0, 2, 1, 3, 4)
    return xb.reshape(gy * gx * TILE * TILE, x.shape[-1])


def bundles_to_image(x: jax.Array, H: int, W: int):
    gy, gx = (H + TILE - 1) // TILE, (W + TILE - 1) // TILE
    C = x.shape[-1] if x.ndim > 1 else 1
    xb = x.reshape(gy, gx, TILE, TILE, C).transpose(0, 2, 1, 3, 4)
    return xb.reshape(gy * TILE, gx * TILE, C)[:H, :W]


def bundle_alpha_mask(render_alpha: jax.Array, H: int, W: int) -> jax.Array:
    """(H, W, 1) render alpha -> (NB,) bool: any pixel in the 16x16 tile hit
    geometry. Reflected rays are only shaded where render_alpha > 0 (the
    specular color is alpha-gated, refl_utils.py:364-401, and the reference
    traces visibility only under mask = render_alpha > 0, :319-330), so
    background bundles — whose rays start at degenerate surface points and
    sweep the whole env cloud — can skip the trace entirely."""
    ab = rays_to_bundles(jax.lax.stop_gradient(render_alpha), H, W)
    return jnp.max(ab.reshape(-1, TILE * TILE), axis=1) > 0.0


def render_indirect(
    env_model: GaussianModel,
    camera: Camera,
    normal_map: jax.Array,  # (H, W, 3)
    surf_depth: jax.Array,  # (H, W)
    tracer_cfg: TracerConfig,
    bundle_mask: jax.Array | None = None,  # (NB,) bool, see bundle_alpha_mask
) -> dict:
    """Reflect camera rays at the surface, trace env gaussians (ref :716)."""
    H, W = camera.height, camera.width
    rays_cam, rays_o = shading.camera_rays_world(camera, unnormalized=True)
    inter = rays_o[None, None, :] + surf_depth[..., None] * rays_cam
    w_o = normalize(-rays_cam)
    rays_refl = normalize(reflect(w_o, normal_map))
    inter = inter + 1e-3 * rays_refl

    ro = rays_to_bundles(inter, H, W)
    rd = rays_to_bundles(rays_refl, H, W)
    shs = jnp.concatenate(
        [env_model.params.features_dc, env_model.params.features_rest], axis=1
    )
    out = trace(
        ro,
        rd,
        env_model.params.xyz,
        env_model.get_scaling,
        env_model.get_rotation,
        env_model.get_opacity[:, 0],
        shs,
        tracer_cfg,
        sh_degree=env_model.max_sh_degree,
        bundle_mask=bundle_mask,
    )
    return {
        "render": bundles_to_image(out["rgb"], H, W),
        "acc": bundles_to_image(out["acc"][:, None], H, W),
        "depth": bundles_to_image(out["depth"][:, None], H, W),
        "normal": bundles_to_image(out["normal"], H, W),
        "overflow": out["overflow"],
        "pairs": out["pairs"],
    }


def trace_visibility(
    pc: GaussianModel,
    camera: Camera,
    normal_map: jax.Array,
    surf_depth: jax.Array,
    tracer_cfg: TracerConfig,
    bundle_mask: jax.Array | None = None,
    offset: float = 3e-2,
) -> tuple[jax.Array, jax.Array]:
    """Returns ((H, W, 1) soft visibility, () overflow count): trace the
    main cloud along reflected rays, vis = 1 - acc (replaces the mesh BVH
    occlusion query). Nonzero overflow means the trace truncated pairs.
    Masked bundles come back acc=0 -> vis=1, the reference's untraced
    default (visibility = ones outside mask, refl_utils.py:319-330).

    offset: ray-origin push along the reflected direction. The reference
    uses 1e-3 against a BVH MESH (envgs_renderer.py:718-724) which its own
    surface cannot self-occlude at that scale; this path traces the SPLAT
    cloud, where the originating surfel itself extends ~2-sigma past the
    rendered depth, so the default escapes it with a larger 3e-2 push
    (characterized on a trained model by scripts/ab_visibility_offset.py)."""
    H, W = camera.height, camera.width
    rays_cam, rays_o = shading.camera_rays_world(camera, unnormalized=True)
    inter = rays_o[None, None, :] + surf_depth[..., None] * rays_cam
    w_o = normalize(-rays_cam)
    rays_refl = normalize(reflect(w_o, normal_map))
    inter = inter + offset * rays_refl

    ro = rays_to_bundles(inter, H, W)
    rd = rays_to_bundles(rays_refl, H, W)
    shs = jnp.zeros((pc.capacity, 1, 3), jnp.float32)
    out = trace(
        ro,
        rd,
        jax.lax.stop_gradient(pc.params.xyz),
        jax.lax.stop_gradient(pc.get_scaling),
        jax.lax.stop_gradient(pc.get_rotation),
        jax.lax.stop_gradient(pc.get_opacity[:, 0]),
        shs,
        tracer_cfg,
        sh_degree=0,
        bundle_mask=bundle_mask,
    )
    vis = 1.0 - out["acc"][:, None]
    return (
        jax.lax.stop_gradient(bundles_to_image(vis, H, W)),
        out["overflow"],
    )


def tracer_demand_probe(
    env_model: GaussianModel,
    camera: Camera,
    normal_map: jax.Array,  # (H, W, 3) alpha-divided
    surf_depth: jax.Array,  # (H, W) or (H, W, 1)
    render_alpha: jax.Array,  # (H, W, 1)
    tracer_cfg: TracerConfig,
    mesh=None,
) -> jax.Array:
    """Pair demand (() int32) of the indirect trace render_surfel2 would
    issue from this view — cull stages only, no binning/kernel/grads. The
    trainer probes this at the surfel2 boundary to size pair_capacity so the
    first traced step is overflow-free by construction (VERDICT r4 item 8)."""
    from materialrefgs_tpu.ops.tracer.api import trace_demand

    H, W = camera.height, camera.width
    if surf_depth.ndim == 3:
        surf_depth = surf_depth[..., 0]
    mask = bundle_alpha_mask(render_alpha, H, W)
    if mesh is not None:
        from materialrefgs_tpu.render.renderers import mesh_visibility_map

        vis = mesh_visibility_map(
            mesh, camera, normal_map, surf_depth, render_alpha,
            cull_cap=tracer_cfg.mesh_cull_cap,
        )
        vb = rays_to_bundles(jax.lax.stop_gradient(vis), H, W)
        mask = mask & (jnp.min(vb.reshape(-1, TILE * TILE), axis=1) < 0.5)

    rays_cam, rays_o = shading.camera_rays_world(camera, unnormalized=True)
    inter = rays_o[None, None, :] + surf_depth[..., None] * rays_cam
    w_o = normalize(-rays_cam)
    rays_refl = normalize(reflect(w_o, normal_map))
    inter = inter + 1e-3 * rays_refl
    return trace_demand(
        rays_to_bundles(inter, H, W),
        rays_to_bundles(rays_refl, H, W),
        env_model.params.xyz,
        env_model.get_scaling,
        env_model.get_opacity[:, 0],
        tracer_cfg,
        bundle_mask=mask,
    )


def render_surfel2(
    pc: GaussianModel,
    env_model: GaussianModel,
    camera: Camera,
    bg_color: jax.Array,
    envmap: EnvLightMips,
    opts: RenderOptions = RenderOptions(),
    tracer_cfg: TracerConfig = TracerConfig(),
    mean2d_offset: jax.Array | None = None,
    with_visibility: bool = True,
    mesh=None,  # ops.mesh_tracer.MeshData: mesh-traced hard visibility
) -> dict:
    """EnvGS composite forward (ref envgs_renderer.py:461-711).

    When `mesh` (the extracted TSDF mesh) is given, specular visibility is
    the mesh-traced occlusion of the reflected rays — the reference's
    surfel4 contract (refl_utils.py:319-330: trace from the unbiased-depth
    surface point, vis = depth >= 10) — and the splat-traced soft visibility
    is skipped. Without a mesh the splat visibility approximates it
    (documented round-1 substitute)."""
    colors = pc.get_colors(camera.camera_center)
    refl = pc.get_refl
    rough = pc.get_rough
    ori_color = pc.get_ori_color
    blend_weight = pc.get_specular
    indirect, normals = _indirect_light(pc, camera, opts)
    distance = _local_distance(pc, camera, normals)

    feats = jnp.concatenate(
        [refl, rough, ori_color, indirect, blend_weight, distance], axis=-1
    )
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
    indirect_residual = f[..., 5:8]
    blend_map = f[..., 8:9]
    dist_map = f[..., 9:10]
    base_color = out["render"]

    regs = _unpack_regularizations(out, camera, opts, dist_map)
    render_alpha = regs["rend_alpha"]
    normal_map = regs["rend_normal"] / jnp.maximum(render_alpha, 1e-6)

    active = bundle_alpha_mask(render_alpha, camera.height, camera.width)

    # Visibility FIRST: traced indirect light only reaches the output as
    # (1 - visibility) * indirect (surfel4 contract, refl_utils.py:364-401),
    # so with the mesh's hard {0,1} visibility in hand the env-GS trace can
    # skip every tile whose pixels are all unoccluded (vis == 1 everywhere
    # -> indirect contribution AND its gradients are exactly zero there).
    # On trained scenes the occluded (self-reflection) region is a small
    # fraction of the image, and the exact-order kernel cost scales with
    # actual pairs — the round-5 sub-second surfel2 step lever.
    visibility = None
    mesh_cull_dropped = jnp.int32(0)
    indirect_mask = active
    if mesh is not None:
        from materialrefgs_tpu.render.renderers import mesh_visibility_map

        visibility, mesh_cull_dropped = mesh_visibility_map(
            mesh, camera, normal_map, regs["surf_depth"], render_alpha,
            cull_cap=tracer_cfg.mesh_cull_cap, with_dropped=True,
        )
        vb = rays_to_bundles(
            jax.lax.stop_gradient(visibility), camera.height, camera.width
        )
        occluded = jnp.min(vb.reshape(-1, TILE * TILE), axis=1) < 0.5
        indirect_mask = active & occluded

    indirect_results = render_indirect(
        env_model, camera, normal_map, regs["surf_depth"], tracer_cfg,
        bundle_mask=indirect_mask,
    )
    indirect_light = indirect_results["render"]
    tracer_overflow = indirect_results["overflow"]

    if mesh is None and with_visibility:
        visibility, vis_overflow = trace_visibility(
            pc, camera, normal_map, regs["surf_depth"], tracer_cfg,
            bundle_mask=active,
        )
        tracer_overflow = tracer_overflow + vis_overflow

    specular, extra = shading.specular_color_surfel(
        envmap,
        albedo_map,
        camera,
        normal_map,
        render_alpha,
        refl_map,
        rough_map,
        visibility=visibility if visibility is not None else jnp.ones_like(render_alpha),
        indirect_light=indirect_light,
        blend_weight=None,  # use_indirect_light_residual=False (ref :663)
        indirect_light_residual=None,
    )

    final = (1 - refl_map) * base_color + specular
    albedo_out = albedo_map
    if opts.srgb:
        final = linear_to_srgb(final)
        albedo_out = linear_to_srgb(albedo_map)
        specular = linear_to_srgb(specular)
    final = final + bg_color[None, None, :] * (1 - render_alpha)

    return {
        "render": final,
        "refl_strength_map": refl_map,
        "diffuse_map": (1 - refl_map) * base_color,
        "diffuse_map_ori": base_color,
        "specular_map": specular,
        "base_color_map": albedo_out,
        "roughness_map": rough_map,
        "blend_weight": blend_map,
        "rend_distance": dist_map,
        "indirect_out": indirect_results,
        "indirect_map": indirect_residual,
        "radii": out["radii"],
        "visibility_filter": out["radii"] > 0,
        "overflow": out["overflow"],
        # Splat-tracer truncation (env-GS indirect + soft-visibility traces):
        # surfaced separately so the trainer escalates tracer_cfg, not the
        # rasterizer's pair capacity.
        "tracer_overflow": tracer_overflow,
        # Pre-truncation pair demand of the indirect trace: the env-GS
        # liveness signal (nonzero demand == the traced stage is actually
        # compositing env gaussians; overflow alone cannot distinguish a
        # fitting budget from a dead cloud).
        "tracer_pairs": indirect_results["pairs"],
        "mesh_cull_dropped": mesh_cull_dropped,
        **regs,
        **extra,
    }
