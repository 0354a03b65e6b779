"""Naive reference splat tracer (pure jnp, autodiff-able).

Replaces the OptiX surfel tracer semantics (gaussian_renderer/optix_utils.py
HardwareRendering + the non-vendored diff_surfel_tracing): rays hit 2D
surfel disks, hits are alpha-composited front-to-back in exact per-ray t
order with the same alpha law as the rasterizer (3-sigma cutoff, alpha_min
1/255, T-stop 1e-4).

O(N_rays * P) memory — for tests and golden values; the production path is
the bundle-culled Pallas tracer validated against this.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from materialrefgs_tpu.utils import sh as sh_utils
from materialrefgs_tpu.utils.transforms import quat_to_rotmat

T_STOP = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
RHO_CUTOFF = 9.0  # 3 sigma


def trace_reference(
    rays_o: jax.Array,  # (N, 3)
    rays_d: jax.Array,  # (N, 3) need not be unit
    means3d: jax.Array,  # (P, 3)
    scales: jax.Array,  # (P, 2)
    rotations: jax.Array,  # (P, 4)
    opacities: jax.Array,  # (P,)
    colors: jax.Array | None,  # (P, 3) fixed per-gaussian colors, or None
    tmin: float = 1e-3,
    shs: jax.Array | None = None,  # (P, K_sh, 3): per-RAY SH colors instead
    sh_degree: int = 3,
) -> dict:
    """Returns per-ray rgb (N,3), acc (N,), depth (N,), normal (N,3).

    With `shs` given, each (ray, gaussian) color is SH evaluated at that
    ray's own unit direction (the production kernel's per-ray contract);
    otherwise `colors` are fixed per gaussian."""
    if shs is not None:
        n_sh = (sh_degree + 1) ** 2
        d_unit = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12
        )
        # (N, P, 3): broadcast SH over rays.
        colors = sh_utils.sh_to_rgb(
            sh_degree,
            shs[None, :, :n_sh, :].transpose(0, 1, 3, 2),  # (1,P,3,n_sh)
            d_unit[:, None, :],
        )
    R = quat_to_rotmat(rotations)
    tu = R[:, :, 0] / jnp.maximum(scales[:, 0:1], 1e-12)  # (P,3) scaled axes
    tv = R[:, :, 1] / jnp.maximum(scales[:, 1:2], 1e-12)
    n = R[:, :, 2]

    # (N, P) geometry
    denom = jnp.einsum("nd,pd->np", rays_d, n)
    denom_ok = jnp.abs(denom) > 1e-9
    denom_s = jnp.where(denom_ok, denom, 1.0)
    po = means3d[None, :, :] - rays_o[:, None, :]  # (N,P,3)
    t = jnp.einsum("npd,pd->np", po, n) / denom_s
    hit = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
    q = hit - means3d[None, :, :]
    u = jnp.einsum("npd,pd->np", q, tu)
    v = jnp.einsum("npd,pd->np", q, tv)
    rho = u * u + v * v

    alpha = jnp.minimum(ALPHA_MAX, opacities[None, :] * jnp.exp(-0.5 * rho))
    ok = denom_ok & (t >= tmin) & (rho <= RHO_CUTOFF) & (alpha >= ALPHA_MIN)
    a = jnp.where(ok, alpha, 0.0)

    # Per-ray sort by t.
    t_sort = jnp.where(ok, t, jnp.inf)
    order = jnp.argsort(t_sort, axis=1, stable=True)  # (N, P)
    a_s = jnp.take_along_axis(a, order, axis=1)
    t_s = jnp.take_along_axis(jnp.where(ok, t, 0.0), order, axis=1)

    one_m = 1.0 - a_s
    T_incl = jnp.cumprod(one_m, axis=1)
    T_before = jnp.concatenate([jnp.ones_like(T_incl[:, :1]), T_incl[:, :-1]], axis=1)
    included = (T_before * one_m) >= T_STOP
    w = a_s * T_before * included  # (N, P)

    if colors.ndim == 2:  # (P,3) fixed -> broadcast over rays
        colors = jnp.broadcast_to(colors[None], (rays_o.shape[0],) + colors.shape)
    cols_s = jnp.take_along_axis(colors, order[..., None], axis=1)
    # Normal flipped against the ray direction.
    n_eff = jnp.where(denom[..., None] > 0, -n[None], n[None])  # (N,P,3)
    n_s = jnp.take_along_axis(n_eff, order[..., None], axis=1)

    rgb = jnp.einsum("np,npc->nc", w, cols_s)
    acc = jnp.sum(w, axis=1)
    depth = jnp.sum(w * t_s, axis=1)
    normal = jnp.einsum("np,npc->nc", w, n_s)
    final_T = jnp.prod(jnp.where(included, one_m, 1.0), axis=1)
    return {
        "rgb": rgb,
        "acc": acc,
        "depth": depth,
        "normal": normal,
        "final_T": final_T,
    }
