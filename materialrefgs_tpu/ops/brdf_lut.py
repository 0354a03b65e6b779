"""Split-sum environment BRDF LUT (Karis 2013), computed numerically.

The reference ships this as a binary asset (utils/refl_utils.py:9,
assets/bsdf_256_256.bin, a (256, 256, 2) texture indexed by
u = NdotV, v = roughness). We integrate it ourselves with GGX importance
sampling + Smith-IBL geometry (k = a^2/2), the standard recipe the asset was
produced with; tests compare against the reference asset bitwise-close.

Lookup convention matches dr.texture(filter_mode='linear',
boundary_mode='clamp'): texel (i, j) center at uv = ((j+0.5)/256, (i+0.5)/256).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_LUT_RES = 256
_CACHE = os.path.join(os.path.dirname(__file__), "_fg_lut_256.npy")
_lut_cached: np.ndarray | None = None


from materialrefgs_tpu.ops.cubemap import _hammersley  # shared quadrature


def compute_fg_lut(res: int = _LUT_RES, n_samples: int = 512) -> np.ndarray:
    """(res, res, 2) float32: LUT[rough_row, nov_col] = (A, B).

    GGX importance sampling + height-correlated Smith visibility (matches the
    reference asset; see tests/test_brdf_lut.py). Computed one roughness row
    at a time to keep temporaries small."""
    nov = ((np.arange(res) + 0.5) / res).astype(np.float32)
    rough = ((np.arange(res) + 0.5) / res).astype(np.float32)
    uv = _hammersley(n_samples).astype(np.float32)
    u = uv[None, :, 0]
    phi = 2 * np.pi * uv[None, :, 1]
    NoV = nov[:, None]  # (res, 1)
    sin_v = np.sqrt(np.maximum(0, 1 - NoV**2))

    out = np.zeros((res, res, 2), np.float32)
    for i, r in enumerate(rough):
        a = np.float32(r * r)
        cos_h = np.sqrt((1 - u) / (1 + (a * a - 1) * u))  # (1, N)
        sin_h = np.sqrt(np.maximum(0, 1 - cos_h**2))
        Hx = sin_h * np.cos(phi)
        Hz = cos_h
        VoH = sin_v * Hx + NoV * Hz  # (res, N)
        Lz = 2 * VoH * Hz - NoV
        NoL = np.maximum(Lz, 0.0)
        NoH = np.maximum(Hz, 0.0)
        VoH = np.maximum(VoH, 0.0)
        lv = NoL * np.sqrt(np.maximum(NoV**2 * (1 - a * a) + a * a, 0.0))
        ll = NoV * np.sqrt(np.maximum(NoL**2 * (1 - a * a) + a * a, 0.0))
        Vis = 0.5 / np.maximum(lv + ll, 1e-8)
        G_vis = np.where(NoL > 0, 4.0 * Vis * NoL * VoH / np.maximum(NoH, 1e-8), 0.0)
        Fc = (1 - VoH) ** 5
        out[i, :, 0] = np.mean((1 - Fc) * G_vis, axis=-1)
        out[i, :, 1] = np.mean(Fc * G_vis, axis=-1)
    return out


def get_fg_lut() -> jax.Array:
    global _lut_cached
    if _lut_cached is None:
        if os.path.exists(_CACHE):
            arr = np.load(_CACHE)
        else:
            arr = compute_fg_lut()
            try:
                np.save(_CACHE, arr)
            except OSError:
                pass
        _lut_cached = arr  # cache numpy; convert per use site (trace safety)
    return jnp.asarray(_lut_cached)


def sample_fg_lut(nov: jax.Array, roughness: jax.Array) -> jax.Array:
    """Bilinear clamped lookup; nov/roughness (...,) -> (..., 2).

    Matches dr.texture(FG_LUT, cat([NdotV, roughness]).clamp(0,1), 'linear',
    'clamp') in utils/refl_utils.py:112."""
    lut = get_fg_lut()
    R = lut.shape[0]
    u = jnp.clip(nov, 0.0, 1.0) * R - 0.5
    v = jnp.clip(roughness, 0.0, 1.0) * R - 0.5
    u0 = jnp.clip(jnp.floor(u), 0, R - 1)
    v0 = jnp.clip(jnp.floor(v), 0, R - 1)
    u1 = jnp.clip(u0 + 1, 0, R - 1)
    v1 = jnp.clip(v0 + 1, 0, R - 1)
    fu = jnp.clip(u - u0, 0, 1)[..., None]
    fv = jnp.clip(v - v0, 0, 1)[..., None]
    u0, u1, v0, v1 = (x.astype(jnp.int32) for x in (u0, u1, v0, v1))
    c00 = lut[v0, u0]
    c01 = lut[v0, u1]
    c10 = lut[v1, u0]
    c11 = lut[v1, u1]
    return (
        c00 * (1 - fu) * (1 - fv)
        + c01 * fu * (1 - fv)
        + c10 * (1 - fu) * fv
        + c11 * fu * fv
    )
