"""Pure-JAX cubemap ops: sampling, mips, diffuse/GGX prefilter.

TPU-native replacement for the reference's nvdiffrast `dr.texture(...,
boundary_mode='cube')` queries (scene/light.py:99-129), renderutils
diffuse/specular cubemap prefilters (scene/renderutils c_src/cubemap.cu), and
the cubemapencoder submodule. At 6x128x128 resolution, gather-based texture
fetches and dense convolutions are XLA-friendly; no custom kernels needed.

Face/uv conventions follow scene/light_utils.py cube_to_dir (OpenGL cubemap):
  face 0 (+x): dir = ( 1, -y, -x)      face 1 (-x): dir = (-1, -y,  x)
  face 2 (+y): dir = ( x,  1,  y)      face 3 (-y): dir = ( x, -1, -y)
  face 4 (+z): dir = ( x, -y,  1)      face 5 (-z): dir = (-x, -y, -1)
with texel centers at x,y in linspace(-1+1/R, 1-1/R, R).

Differences by design (documented divergences from the reference):
  - Bilinear filtering clamps at face edges instead of nvdiffrast's seamless
    cross-face blend; at 128^2 with a *trained* env map this is absorbed into
    the learned logits.
  - The GGX prefilter uses filtered importance sampling (Karis split-sum)
    with a fixed Hammersley pattern instead of nvdiffrec's NDF-bounded dense
    convolution; same integral, different quadrature.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def cube_to_dir(face: int, x: jax.Array, y: jax.Array) -> jax.Array:
    one = jnp.ones_like(x)
    table = {
        0: (one, -y, -x),
        1: (-one, -y, x),
        2: (x, one, y),
        3: (x, -one, -y),
        4: (x, -y, one),
        5: (-x, -y, -one),
    }
    return jnp.stack(table[face], axis=-1)


def face_dirs(res: int) -> jax.Array:
    """(6, R, R, 3) unit direction of each texel center."""
    g = jnp.linspace(-1.0 + 1.0 / res, 1.0 - 1.0 / res, res)
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    dirs = jnp.stack([cube_to_dir(s, gx, gy) for s in range(6)], axis=0)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def dir_to_cube_uv(d: jax.Array):
    """Direction (..., 3) -> (face (...,), u (...,), v (...,)) with u,v in [-1,1]."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # Major axis selection.
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)
    eps = 1e-12
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az)) + eps
    # Per-face (u, v), inverted from cube_to_dir.
    u = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y))
    return face, u / ma, v / ma


def sample_cubemap(cubemap: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear cubemap fetch. cubemap (6, R, R, C); dirs (..., 3) -> (..., C).

    Edge handling: clamp-to-face-edge (see module docstring)."""
    R = cubemap.shape[1]
    face, u, v = dir_to_cube_uv(dirs)
    tu = (u + 1.0) * (R / 2.0) - 0.5
    tv = (v + 1.0) * (R / 2.0) - 0.5
    u0 = jnp.clip(jnp.floor(tu), 0, R - 1)
    v0 = jnp.clip(jnp.floor(tv), 0, R - 1)
    u1 = jnp.clip(u0 + 1, 0, R - 1)
    v1 = jnp.clip(v0 + 1, 0, R - 1)
    fu = jnp.clip(tu - u0, 0.0, 1.0)
    fv = jnp.clip(tv - v0, 0.0, 1.0)
    u0i, u1i, v0i, v1i = (a.astype(jnp.int32) for a in (u0, u1, v0, v1))

    def fetch(vi, ui):
        return cubemap[face, vi, ui]  # (..., C); rows indexed by v (gy), cols by u

    c00 = fetch(v0i, u0i)
    c01 = fetch(v0i, u1i)
    c10 = fetch(v1i, u0i)
    c11 = fetch(v1i, u1i)
    fu_ = fu[..., None]
    fv_ = fv[..., None]
    return (
        c00 * (1 - fu_) * (1 - fv_)
        + c01 * fu_ * (1 - fv_)
        + c10 * (1 - fu_) * fv_
        + c11 * fu_ * fv_
    )


def cubemap_avg_pool(cubemap: jax.Array) -> jax.Array:
    """2x2 average pool per face (scene/light_utils.py cubemap_mip forward)."""
    six, R, _, C = cubemap.shape
    x = cubemap.reshape(six, R // 2, 2, R // 2, 2, C)
    return x.mean(axis=(2, 4))


def texel_solid_angles(res: int) -> jax.Array:
    """(6, R, R) solid angle of each texel: (2/R)^2 / (x^2+y^2+1)^(3/2)."""
    g = np.linspace(-1.0 + 1.0 / res, 1.0 - 1.0 / res, res)
    gy, gx = np.meshgrid(g, g, indexing="ij")
    w = (2.0 / res) ** 2 / np.power(gx**2 + gy**2 + 1.0, 1.5)
    return jnp.asarray(np.broadcast_to(w, (6, res, res)), jnp.float32)


def diffuse_convolve(cubemap: jax.Array) -> jax.Array:
    """Cosine-weighted hemisphere convolution (renderutils diffuse_cubemap,
    cubemap.cu:110-180): out[n] = sum_t L_t max(n.d_t, 0) w_t / sum_t cos w_t."""
    six, R, _, C = cubemap.shape
    dirs = face_dirs(R).reshape(-1, 3)  # (6RR, 3)
    w = texel_solid_angles(R).reshape(-1)  # (6RR,)
    L = cubemap.reshape(-1, C)
    cos = jnp.maximum(dirs @ dirs.T, 0.0)  # (6RR, 6RR) n.d
    wc = cos * w[None, :]
    out = (wc @ L) / jnp.sum(wc, axis=1, keepdims=True)
    return out.reshape(six, R, R, C)


def _hammersley(n: int) -> np.ndarray:
    pts = np.zeros((n, 2), np.float64)
    pts[:, 0] = (np.arange(n) + 0.5) / n
    # radical inverse base 2
    b = np.arange(n, dtype=np.uint32)
    b = (b << 16) | (b >> 16)
    b = ((b & 0x55555555) << 1) | ((b & 0xAAAAAAAA) >> 1)
    b = ((b & 0x33333333) << 2) | ((b & 0xCCCCCCCC) >> 2)
    b = ((b & 0x0F0F0F0F) << 4) | ((b & 0xF0F0F0F0) >> 4)
    b = ((b & 0x00FF00FF) << 8) | ((b & 0xFF00FF00) >> 8)
    pts[:, 1] = b.astype(np.float64) * 2.3283064365386963e-10
    return pts


@functools.lru_cache(maxsize=16)
def _ggx_sample_dirs(roughness: float, n_samples: int):
    """Tangent-space GGX sample dirs (reflected L for V=N) + NoL weights."""
    uv = _hammersley(n_samples)
    a = roughness * roughness
    cos_h = np.sqrt((1.0 - uv[:, 0]) / (1.0 + (a * a - 1.0) * uv[:, 0]))
    sin_h = np.sqrt(np.maximum(0.0, 1.0 - cos_h**2))
    phi = 2.0 * np.pi * uv[:, 1]
    h = np.stack([sin_h * np.cos(phi), sin_h * np.sin(phi), cos_h], axis=-1)
    # V = N = +z; L = reflect(V, H) = 2(V.H)H - V
    l = 2.0 * h[:, 2:3] * h - np.array([0.0, 0.0, 1.0])
    nol = np.maximum(l[:, 2], 0.0)
    keep = nol > 1e-6
    # Cache NUMPY (never jnp: arrays created inside a jit trace are tracers
    # and must not leak across traces via the lru_cache).
    return l[keep].astype(np.float32), nol[keep].astype(np.float32)


def ggx_prefilter(
    cubemap: jax.Array, roughness: float, n_samples: int = 64
) -> jax.Array:
    """Split-sum GGX prefilter (renderutils specular_cubemap equivalent):
    out[n] = sum_s L(rot_n(l_s)) NoL_s / sum NoL_s, filtered importance
    sampling around each texel's direction."""
    if roughness < 1e-3:
        return cubemap
    six, R, _, C = cubemap.shape
    dirs = face_dirs(R)  # (6,R,R,3)
    l_np, nol_np = _ggx_sample_dirs(float(roughness), n_samples)
    l_tan, nol = jnp.asarray(l_np), jnp.asarray(nol_np)  # (M,3),(M,)
    # Build per-texel tangent frames (branchless: pick a helper axis).
    n = dirs
    helper = jnp.where(
        (jnp.abs(n[..., 2:3]) < 0.999),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 0.0]),
    )
    t = jnp.cross(helper, n)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    b = jnp.cross(n, t)

    # One batched gather over all (texel, sample) pairs — a lax.scan over
    # samples serializes M small gathers and dominates the train step.
    world = (
        l_tan[:, None, None, None, 0:1] * t[None]
        + l_tan[:, None, None, None, 1:2] * b[None]
        + l_tan[:, None, None, None, 2:3] * n[None]
    )  # (M, 6, R, R, 3)
    samples = sample_cubemap(cubemap, world)  # (M, 6, R, R, C)
    acc = jnp.tensordot(nol, samples, axes=(0, 0))  # (6, R, R, C)
    return acc / jnp.sum(nol)


def build_mip_chain(
    base: jax.Array,
    min_res: int = 16,
    min_roughness: float = 0.08,
    max_roughness: float = 0.5,
    n_samples: int = 64,
):
    """EnvLight.build_mips (scene/light.py:72-90): avg-pool chain, GGX-filter
    each level with linearly mapped roughness, diffuse-convolve the smallest.

    Returns (specular_levels: list[(6,r,r,C)], diffuse: (6,min_res,min_res,C)).
    """
    pooled = [base]
    while pooled[-1].shape[1] > min_res:
        pooled.append(cubemap_avg_pool(pooled[-1]))
    L = len(pooled)
    diffuse = diffuse_convolve(pooled[-1])
    specular = []
    for idx in range(L - 1):
        rough = (idx / max(L - 2, 1)) * (max_roughness - min_roughness) + min_roughness
        specular.append(ggx_prefilter(pooled[idx], rough, n_samples))
    specular.append(ggx_prefilter(pooled[-1], 1.0, n_samples))
    return specular, diffuse


def get_mip(
    roughness: jax.Array,
    num_levels: int,
    min_roughness: float = 0.08,
    max_roughness: float = 0.5,
) -> jax.Array:
    """scene/light.py:88-96 roughness -> fractional mip level."""
    lo = (
        (jnp.clip(roughness, min_roughness, max_roughness) - min_roughness)
        / (max_roughness - min_roughness)
        * (num_levels - 2)
    )
    hi = (jnp.clip(roughness, max_roughness, 1.0) - max_roughness) / (
        1.0 - max_roughness
    ) + num_levels - 2
    return jnp.where(roughness < max_roughness, lo, hi)


def sample_mip_chain(levels: list, dirs: jax.Array, mip: jax.Array) -> jax.Array:
    """Trilinear: bilinear per level + linear between adjacent mip levels."""
    L = len(levels)
    mip = jnp.clip(mip, 0.0, L - 1.0)
    lo = jnp.clip(jnp.floor(mip).astype(jnp.int32), 0, L - 1)
    frac = (mip - lo.astype(mip.dtype))[..., None]
    samples = jnp.stack([sample_cubemap(lv, dirs) for lv in levels], axis=0)
    take_lo = jnp.take_along_axis(samples, lo[None, ..., None], axis=0)[0]
    hi = jnp.minimum(lo + 1, L - 1)
    take_hi = jnp.take_along_axis(samples, hi[None, ..., None], axis=0)[0]
    return take_lo * (1 - frac) + take_hi * frac


def latlong_to_cubemap(latlong: jax.Array, res: int) -> jax.Array:
    """(H, W, C) equirectangular -> (6, res, res, C) cubemap
    (scene/light_utils.py:34-47)."""
    H, W, C = latlong.shape
    v = face_dirs(res)  # (6, res, res, 3), unit
    tu = jnp.arctan2(v[..., 0], -v[..., 2]) / (2 * np.pi) + 0.5
    tv = jnp.arccos(jnp.clip(v[..., 1], -1, 1)) / np.pi
    x = tu * W - 0.5
    y = tv * H - 0.5
    # Longitude WRAPS (dr.texture's default boundary): clamping would
    # re-blend the last column into itself at the +-pi meridian, leaving
    # a one-texel vertical seam in HDR-imported env maps.
    x0f = jnp.floor(x)
    x0 = jnp.mod(x0f, W)
    x1 = jnp.mod(x0f + 1, W)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fx = jnp.clip(x - x0f, 0, 1)[..., None]
    fy = jnp.clip(y - y0, 0, 1)[..., None]
    x0, x1, y0, y1 = (a.astype(jnp.int32) for a in (x0, x1, y0, y1))
    out = (
        latlong[y0, x0] * (1 - fx) * (1 - fy)
        + latlong[y0, x1] * fx * (1 - fy)
        + latlong[y1, x0] * (1 - fx) * fy
        + latlong[y1, x1] * fx * fy
    )
    return out


def cubemap_to_latlong(cubemap: jax.Array, H: int, W: int) -> jax.Array:
    """(6, R, R, C) -> (H, W, C) equirectangular (scene/light_utils.py:50-64)."""
    gy = jnp.linspace(0.0 + 1.0 / H, 1.0 - 1.0 / H, H)[:, None]
    gx = jnp.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W)[None, :]
    sintheta, costheta = jnp.sin(gy * np.pi), jnp.cos(gy * np.pi)
    sinphi, cosphi = jnp.sin(gx * np.pi), jnp.cos(gx * np.pi)
    refl = jnp.stack(
        [
            jnp.broadcast_to(sintheta * sinphi, (H, W)),
            jnp.broadcast_to(costheta, (H, W)),
            jnp.broadcast_to(-sintheta * cosphi, (H, W)),
        ],
        axis=-1,
    )
    return sample_cubemap(cubemap, refl)
