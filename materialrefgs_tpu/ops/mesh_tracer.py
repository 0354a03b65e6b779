"""TPU-native mesh ray tracer + one-bounce shade (raytracing_brdf replacement).

Reference: raytracing_brdf/raytracer.py (OptiX BVH wrapper) — used by
scene/gaussian_model.py:1068-1071 update_mesh() on the TSDF-extracted mesh,
and by utils/refl_utils.py:101-190 (raytracing_residual branch) for
reflected-ray visibility + one-bounce indirect shading.

TPU design notes
----------------
No BVH: data-dependent tree traversal maps poorly onto XLA (dynamic trip
counts, gather-heavy). Instead, nearest-hit is a dense streaming reduction:
triangles are padded to a static multiple of TRI_CHUNK and scanned in chunks
with Moller-Trumbore intersection evaluated for (ray_block x tri_chunk) at
once on the VPU, carrying a running (t, tri_id, u, v) minimum. This is
O(R*T) FLOPs but perfectly static, fuses into a handful of elementwise
kernels, and for the mesh sizes this path sees (TSDF meshes, 1e4-1e6 tris;
reflected-ray queries on masked pixels) the arithmetic is cheap relative to
its memory traffic. A Morton-ordered cluster pre-cull can be layered on top
later without changing this API.

Divergence from the reference (documented, intentional):
- raytracer.py:264-266 samples the FG LUT for the *first* secondary hit only
  (`fg[0][..., 0:1]` on an (N, 2) tensor broadcasts ray 0's value to all
  rays). We evaluate the LUT per ray.
- Barycentric weights come from the Moller-Trumbore (u, v) directly instead
  of re-deriving them from triangle areas (raytracer.py:176-199) — same
  values, fewer ops, and exact at edges.
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.ops.brdf_lut import sample_fg_lut
from materialrefgs_tpu.utils.transforms import normalize, reflect

TRI_CHUNK = 512
RAY_BLOCK = 2048
T_FAR = 10.0  # reference miss sentinel (raytracer.py:220 hit_depth==10.)


@flax.struct.dataclass
class MeshData:
    """Static-shape triangle soup with precomputed intersection terms."""

    v0: jax.Array  # (T, 3) first vertex of each triangle
    e1: jax.Array  # (T, 3) v1 - v0
    e2: jax.Array  # (T, 3) v2 - v0
    normal: jax.Array  # (T, 3) unit geometric normal
    valid: jax.Array  # (T,) bool, False on padding rows
    vertices: jax.Array  # (V, 3)
    triangles: jax.Array  # (T, 3) int32 vertex ids (clamped on padding)
    attrs: dict = flax.struct.field(default_factory=dict)  # name -> (V, C)

    @property
    def n_tris(self) -> int:
        return self.v0.shape[0]


def build_mesh(
    vertices: np.ndarray,
    triangles: np.ndarray,
    attrs: dict | None = None,
    chunk: int = TRI_CHUNK,
) -> MeshData:
    """Pack (V,3) vertices + (T,3) int triangles into a padded MeshData.

    attrs maps name -> (V, C) per-vertex arrays (reference load_from_ply_file
    prefixes: diffuse/roughness/albedo/metallic/normal)."""
    vertices = np.asarray(vertices, np.float32)
    triangles = np.asarray(triangles, np.int32)
    T = triangles.shape[0]
    T_pad = max(chunk, ((T + chunk - 1) // chunk) * chunk)
    tri_pad = np.zeros((T_pad, 3), np.int32)
    tri_pad[:T] = triangles
    valid = np.zeros((T_pad,), bool)
    valid[:T] = True

    tv = vertices[tri_pad]  # (T_pad, 3, 3)
    v0 = tv[:, 0]
    e1 = tv[:, 1] - v0
    e2 = tv[:, 2] - v0
    n = np.cross(e1, e2)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return MeshData(
        v0=jnp.asarray(v0),
        e1=jnp.asarray(e1),
        e2=jnp.asarray(e2),
        normal=jnp.asarray(n),
        valid=jnp.asarray(valid),
        vertices=jnp.asarray(vertices),
        triangles=jnp.asarray(tri_pad),
        attrs={k: jnp.asarray(v, jnp.float32) for k, v in (attrs or {}).items()},
    )


def _trace_block(mesh: MeshData, rays_o, rays_d, t_min, t_far):
    """Nearest hit for one (R, 3) ray block. Returns t, tri, u, v arrays."""
    R = rays_o.shape[0]
    Tn = mesh.n_tris
    n_chunks = Tn // TRI_CHUNK

    def body(carry, ci):
        best_t, best_tri, best_u, best_v = carry
        sl = ci * TRI_CHUNK
        v0 = jax.lax.dynamic_slice_in_dim(mesh.v0, sl, TRI_CHUNK)
        e1 = jax.lax.dynamic_slice_in_dim(mesh.e1, sl, TRI_CHUNK)
        e2 = jax.lax.dynamic_slice_in_dim(mesh.e2, sl, TRI_CHUNK)
        ok = jax.lax.dynamic_slice_in_dim(mesh.valid, sl, TRI_CHUNK)

        # Moller-Trumbore, (R, C) batched.
        h = jnp.cross(rays_d[:, None, :], e2[None, :, :])  # (R, C, 3)
        a = jnp.sum(e1[None] * h, axis=-1)  # (R, C)
        f = jnp.where(jnp.abs(a) > 1e-9, 1.0 / jnp.where(a == 0, 1.0, a), 0.0)
        s = rays_o[:, None, :] - v0[None]  # (R, C, 3)
        u = f * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, e1[None])
        v = f * jnp.sum(rays_d[:, None, :] * q, axis=-1)
        t = f * jnp.sum(e2[None] * q, axis=-1)
        hit = (
            ok[None]
            & (jnp.abs(a) > 1e-9)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= t_min)
            & (t < t_far)
        )
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)  # (R,)
        r = jnp.arange(R)
        tc, uc, vc = t[r, j], u[r, j], v[r, j]
        better = tc < best_t
        best_tri = jnp.where(better, sl + j, best_tri)
        best_u = jnp.where(better, uc, best_u)
        best_v = jnp.where(better, vc, best_v)
        best_t = jnp.minimum(best_t, tc)
        return (best_t, best_tri, best_u, best_v), None

    init = (
        jnp.full((R,), jnp.inf),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,)),
        jnp.zeros((R,)),
    )
    (t, tri, u, v), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return t, tri, u, v


def trace(
    mesh: MeshData,
    rays_o: jax.Array,  # (..., 3)
    rays_d: jax.Array,  # (..., 3) need not be unit; t is in units of |d|
    t_min: float = 1e-3,
    t_far: float = T_FAR,
):
    """Nearest-hit trace. Returns dict with
      pos (..., 3), normal (..., 3), depth (...,), tri (...,), bary (..., 2).
    Miss: depth = t_far, tri = -1, pos = o + t_far * d, normal = 0
    (matching raytracer.py trace(): positions advance to far, depth 10)."""
    shape = rays_o.shape[:-1]
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    R = o.shape[0]
    R_pad = max(RAY_BLOCK, ((R + RAY_BLOCK - 1) // RAY_BLOCK) * RAY_BLOCK)
    o = jnp.concatenate([o, jnp.zeros((R_pad - R, 3))], 0)
    d = jnp.concatenate([d, jnp.ones((R_pad - R, 3))], 0)

    def blk(args):
        return _trace_block(mesh, args[0], args[1], t_min, t_far)

    n_blk = R_pad // RAY_BLOCK
    t, tri, u, v = jax.lax.map(
        blk, (o.reshape(n_blk, RAY_BLOCK, 3), d.reshape(n_blk, RAY_BLOCK, 3))
    )
    t, tri, u, v = (x.reshape(-1)[:R] for x in (t, tri, u, v))

    hit = tri >= 0
    t_out = jnp.where(hit, t, t_far)
    o, d = o[:R], d[:R]
    pos = o + t_out[:, None] * d
    nrm = jnp.where(hit[:, None], mesh.normal[jnp.maximum(tri, 0)], 0.0)
    return {
        "pos": pos.reshape(*shape, 3),
        "normal": nrm.reshape(*shape, 3),
        "depth": t_out.reshape(shape),
        "tri": jnp.where(hit, tri, -1).reshape(shape),
        "bary": jnp.stack([u, v], -1).reshape(*shape, 2),
    }


def interpolate_attr(mesh: MeshData, name: str, tri: jax.Array, bary: jax.Array):
    """Barycentric vertex-attribute interpolation at hit points.

    tri (...,) int, bary (..., 2) = (u, v); weight of v0 is 1-u-v
    (raytracer.py:176-199 barycentric_interpolation, exact form)."""
    vals = mesh.attrs[name]  # (V, C)
    ids = mesh.triangles[jnp.maximum(tri, 0)]  # (..., 3)
    tv = vals[ids]  # (..., 3, C)
    u, v = bary[..., 0:1], bary[..., 1:2]
    w = jnp.concatenate([1.0 - u - v, u, v], axis=-1)  # (..., 3)
    return jnp.sum(tv * w[..., None], axis=-2)


def secondary_color(
    mesh: MeshData,
    envmap,  # EnvLightMips
    hit: dict,  # trace() result for the secondary rays
    rays_d: jax.Array,  # (..., 3) unit secondary ray directions
) -> jax.Array:
    """Color seen along secondary rays (raytracer.py:208-273
    secondary_indirect_color): miss -> pure env fetch along the ray; hit ->
    split-sum shade of the baked vertex materials at the hit point."""
    miss_color = envmap(normalize(rays_d), mode="pure_env")

    tri, bary = hit["tri"], hit["bary"]

    def attr_or(name, default):
        if name in mesh.attrs:
            return interpolate_attr(mesh, name, tri, bary)
        return jnp.broadcast_to(
            jnp.asarray(default, jnp.float32), (*tri.shape, len(default))
        )

    diffuse = attr_or("diffuse", (0.0, 0.0, 0.0))
    metallic = attr_or("metallic", (0.0,))
    rough = attr_or("roughness", (1.0,))
    albedo = attr_or("albedo", (0.5, 0.5, 0.5))
    if "normal" in mesh.attrs:
        nrm = interpolate_attr(mesh, "normal", tri, bary) * 2.0 - 1.0
    else:
        nrm = hit["normal"]  # geometric fallback for attr-less meshes

    w_o = -normalize(rays_d)
    rays_l = normalize(reflect(w_o, nrm))
    NoV = jnp.sum(w_o * nrm, axis=-1, keepdims=True)
    fg = sample_fg_lut(NoV[..., 0], rough[..., 0])  # per-ray (diverges, see module doc)
    direct = envmap(rays_l, roughness=rough)
    spec_w = (0.04 * (1 - metallic) + albedo * metallic) * fg[..., 0:1] + fg[..., 1:2]
    hit_color = (1 - metallic) * diffuse + spec_w * direct

    is_hit = (hit["tri"] >= 0)[..., None]
    return jnp.where(is_hit, hit_color, miss_color)


def shade_one_bounce(
    mesh: MeshData,
    envmap,
    surface_pos: jax.Array,  # (..., 3)
    rays_n: jax.Array,  # (..., 3) unit surface normal
    rays_v: jax.Array,  # (..., 3) unit view dir, pointing off the surface
) -> dict:
    """One-bounce indirect light at surface points (raytracer.py:274-300
    shade + refl_utils.py:120-150): reflect the view ray, nearest-hit the
    mesh, and return the color seen along the bounce plus visibility.

    Returns {indirect (..., 3), visibility (..., 1), depth (...,)}."""
    incident = normalize(reflect(rays_v, rays_n))
    hit = trace(mesh, surface_pos, incident)
    indirect = secondary_color(mesh, envmap, hit, incident)
    vis = (hit["depth"] >= T_FAR).astype(jnp.float32)[..., None]
    return {"indirect": indirect, "visibility": vis, "depth": hit["depth"]}


def bake_vertex_attrs(
    model, vertices: np.ndarray, k: int = 4
) -> dict:
    """Bake per-gaussian materials onto mesh vertices by inverse-distance
    weighting over the k nearest gaussians (replacement for the reference's
    offline attr-baked PLY, raytracer.py:60-81 load_from_ply_file).

    Returns attrs dict for build_mesh (diffuse/roughness/albedo/metallic/
    normal; normal stored in [0,1] like the reference's PLY)."""
    from materialrefgs_tpu.models.gaussian_model import GaussianModel

    assert isinstance(model, GaussianModel)
    xyz = np.asarray(model.params.xyz)
    alive = np.asarray(model.alive)
    xyz_a = xyz[alive] if alive.any() else xyz
    from scipy.spatial import cKDTree

    dist, idx = cKDTree(xyz_a).query(np.asarray(vertices, np.float32), k=k)
    w = 1.0 / np.maximum(dist, 1e-8)
    w = w / w.sum(-1, keepdims=True)  # (V, k)

    def gather(arr):
        a = np.asarray(arr)
        a = a[alive] if alive.any() else a
        return np.einsum("vk,vkc->vc", w, a[idx]).astype(np.float32)

    albedo = gather(jax.nn.sigmoid(model.params.ori_color))
    metallic = gather(jax.nn.sigmoid(model.params.refl_strength))
    rough = gather(jax.nn.sigmoid(model.params.roughness))
    normals = gather(model.get_world_normal())
    nn = normals / np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-8)
    return {
        "diffuse": (1.0 - metallic) * albedo,
        "albedo": albedo,
        "metallic": metallic,
        "roughness": rough,
        "normal": nn * 0.5 + 0.5,
    }
