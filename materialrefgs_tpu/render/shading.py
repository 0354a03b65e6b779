"""Deferred split-sum shading (reference utils/refl_utils.py).

All maps are channel-last (H, W, C). Shading contract
(refl_utils.py:188-245 get_specular_color_surfel2 and :461+ surfel/surfel4):

  w_o        = -normalize(camera ray)
  refl, NoV  = reflect(w_o, normal)
  fg         = FG_LUT(NoV, roughness)                       (2,)
  direct     = envmap(refl, roughness)                      sigmoid'd RGB
  spec_w     = (0.04 * (1 - m) + albedo * m) * fg.x + fg.y
  spec_light = direct * vis + (1 - vis) * indirect          (if vis given)
  specular   = spec_light * alpha * spec_w
  final      = (1 - m) * base + specular                    (in render paths)
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from materialrefgs_tpu.cameras import Camera
from materialrefgs_tpu.ops.brdf_lut import sample_fg_lut
from materialrefgs_tpu.utils.transforms import normalize, reflect


def camera_rays_world(camera: Camera, unnormalized: bool = False):
    """Per-pixel world-space ray dirs (H, W, 3) + origin (3,).

    Matches refl_utils.py:54-93 sample_camera_rays{,_unnormalize}: pixel grid
    at integer coords, K^-1 backprojection, rotated to world."""
    H, W = camera.height, camera.width
    d_cam = camera.get_rays()  # (H, W, 3) camera-space, z=1
    R = camera.world_view[:3, :3]  # world->view rotation (row-vector form)
    d_world = jnp.einsum("hwc,cd->hwd", d_cam, R.T)
    rays_o = camera.camera_center
    if not unnormalized:
        d_world = normalize(d_world)
    return d_world, rays_o


def specular_color_surfel(
    envmap,  # EnvLightMips
    albedo: jax.Array,  # (H, W, 3)
    camera: Camera,
    normal_map: jax.Array,  # (H, W, 3) world-space
    render_alpha: jax.Array,  # (H, W, 1)
    refl_strength: jax.Array,  # (H, W, 1) metallic
    roughness: jax.Array,  # (H, W, 1)
    visibility: jax.Array | None = None,  # (H, W, 1) or None
    indirect_light: jax.Array | None = None,  # (H, W, 3) or None
    blend_weight: jax.Array | None = None,  # (H, W, 1) EnvGS blend (surfel4)
    indirect_light_residual: jax.Array | None = None,  # (H, W, 3)
) -> tuple[jax.Array, dict]:
    """Deferred specular shading; returns (specular (H,W,3), extras)."""
    rays_d, _ = camera_rays_world(camera)
    w_o = -rays_d
    NoV = jnp.sum(w_o * normal_map, axis=-1, keepdims=True)
    rays_refl = normalize(reflect(w_o, normal_map))

    fg = sample_fg_lut(NoV[..., 0], roughness[..., 0])  # (H, W, 2)
    direct_light = envmap(rays_refl, roughness=roughness)
    specular_weight = (
        0.04 * (1 - refl_strength) + albedo * refl_strength
    ) * fg[..., 0:1] + fg[..., 1:2]

    extras = {"direct_light": direct_light, "specular_weight": specular_weight}
    if visibility is not None and indirect_light is not None:
        if blend_weight is not None and indirect_light_residual is not None:
            indirect_light = (
                1 - blend_weight
            ) * indirect_light + blend_weight * indirect_light_residual
        specular_light = direct_light * visibility + (1 - visibility) * indirect_light
        extras["visibility"] = visibility
        extras["indirect_light"] = indirect_light
        extras["indirect_color"] = (
            (1 - visibility) * indirect_light * render_alpha * specular_weight
        )
    elif visibility is not None:
        # surfel2 flavor: direct light masked by visibility only.
        specular_light = direct_light * visibility
        extras["visibility"] = visibility
    else:
        specular_light = direct_light

    specular = specular_light * render_alpha * specular_weight
    return specular, extras


def full_color_volume(
    envmap,
    xyz: jax.Array,  # (P, 3)
    albedo: jax.Array,  # (P, 3)
    camera: Camera,
    normal: jax.Array,  # (P, 3) world-space
    refl_strength: jax.Array,  # (P, 1)
    roughness: jax.Array,  # (P, 1)
    visibility: jax.Array | None = None,  # (P, 1)
    indirect_light: jax.Array | None = None,  # (P, 3)
):
    """Per-Gaussian forward shading (refl_utils.py:426-489
    get_full_color_volume{,_indirect}): returns (diffuse, specular, extras)."""
    rays_o = camera.camera_center
    w_o = normalize(rays_o[None, :] - xyz)
    NoV = jnp.sum(w_o * normal, axis=-1, keepdims=True)
    rays_refl = normalize(reflect(w_o, normal))

    fg = sample_fg_lut(NoV[..., 0], roughness[..., 0])  # (P, 2)
    diffuse = envmap(normal, mode="diffuse") * (1 - refl_strength) * albedo
    direct_light = envmap(rays_refl, roughness=roughness)
    specular_weight = (
        0.04 * (1 - refl_strength) + albedo * refl_strength
    ) * fg[..., 0:1] + fg[..., 1:2]
    if visibility is not None and indirect_light is not None:
        specular_light = direct_light * visibility + (1 - visibility) * indirect_light
    else:
        specular_light = direct_light
    specular = specular_light * specular_weight
    extras = {"direct_light": direct_light, "visibility": visibility}
    return diffuse, specular, extras
