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
CLUSTER = 64  # triangles per Morton cluster (pre-cull granularity)


@flax.struct.dataclass
class MeshData:
    """Static-shape triangle soup with precomputed intersection terms.

    Triangles are Morton-ordered (centroid Z-curve) so consecutive CLUSTER
    rows are spatially tight; cluster_lo/hi are their AABBs, used by the
    culled trace path (the TPU stand-in for the reference's BVH,
    submodules/raytracing/bvh.cu)."""

    v0: jax.Array  # (T, 3) first vertex of each triangle
    e1: jax.Array  # (T, 3) v1 - v0
    e2: jax.Array  # (T, 3) v2 - v0
    normal: jax.Array  # (T, 3) unit geometric normal
    valid: jax.Array  # (T,) bool, False on padding rows
    vertices: jax.Array  # (V, 3)
    triangles: jax.Array  # (T, 3) int32 vertex ids (clamped on padding)
    cluster_lo: jax.Array  # (NC, 3) cluster AABB mins (padding: +inf)
    cluster_hi: jax.Array  # (NC, 3) cluster AABB maxs (padding: -inf)
    attrs: dict = flax.struct.field(default_factory=dict)  # name -> (V, C)

    @property
    def n_tris(self) -> int:
        return self.v0.shape[0]

    @property
    def n_clusters(self) -> int:
        return self.cluster_lo.shape[0]


def _morton_order(centroids: np.ndarray) -> np.ndarray:
    """Sort order of points along a 30-bit 3D Morton curve."""
    lo = centroids.min(0)
    span = np.maximum(centroids.max(0) - lo, 1e-12)
    q = np.clip(((centroids - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return np.argsort(code, kind="stable")


def build_mesh(
    vertices: np.ndarray,
    triangles: np.ndarray,
    attrs: dict | None = None,
    chunk: int = TRI_CHUNK,
    pad_to: int | None = None,
    pad_verts_to: int | None = None,
) -> MeshData:
    """Pack (V,3) vertices + (T,3) int triangles into a padded MeshData.

    attrs maps name -> (V, C) per-vertex arrays (reference load_from_ply_file
    prefixes: diffuse/roughness/albedo/metallic/normal).

    pad_to / pad_verts_to pad the triangle / vertex counts to a fixed
    capacity so periodic mesh rebuilds (trainer past indirect_from_iter)
    keep static shapes and never retrace the jitted train step."""
    vertices = np.asarray(vertices, np.float32)
    triangles = np.asarray(triangles, np.int32)
    T = triangles.shape[0]
    if pad_to is not None and T > pad_to:
        raise ValueError(f"mesh has {T} triangles > pad_to={pad_to}")
    if pad_verts_to is not None:
        if vertices.shape[0] > pad_verts_to:
            raise ValueError(
                f"mesh has {vertices.shape[0]} vertices > pad_verts_to={pad_verts_to}"
            )
        vertices = np.concatenate(
            [vertices, np.zeros((pad_verts_to - vertices.shape[0], 3), np.float32)]
        )
    if vertices.shape[0] == 0:
        vertices = np.zeros((1, 3), np.float32)  # padding rows index vertex 0
    if T > 0:
        cent = vertices[triangles].mean(axis=1)
        triangles = triangles[_morton_order(cent)]
    T_pad = max(chunk, ((max(T, pad_to or 0) + chunk - 1) // chunk) * chunk)
    T_pad = ((T_pad + CLUSTER - 1) // CLUSTER) * CLUSTER
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

    # Cluster AABBs over Morton-consecutive triangle groups.
    NC = T_pad // CLUSTER
    tvc = tv.reshape(NC, CLUSTER, 3, 3)
    vmask = valid.reshape(NC, CLUSTER, 1, 1)
    lo = np.where(vmask, tvc, np.inf).min(axis=(1, 2))
    hi = np.where(vmask, tvc, -np.inf).max(axis=(1, 2))
    return MeshData(
        v0=jnp.asarray(v0),
        e1=jnp.asarray(e1),
        e2=jnp.asarray(e2),
        normal=jnp.asarray(n),
        valid=jnp.asarray(valid),
        vertices=jnp.asarray(vertices),
        triangles=jnp.asarray(tri_pad),
        cluster_lo=jnp.asarray(lo.astype(np.float32)),
        cluster_hi=jnp.asarray(hi.astype(np.float32)),
        attrs={k: jnp.asarray(v, jnp.float32) for k, v in (attrs or {}).items()},
    )


def _trace_block(mesh_v0, mesh_e1, mesh_e2, mesh_valid, gid, rays_o, rays_d, t_min, t_far):
    """Nearest hit for one (R, 3) ray block against a (Tn, 3) triangle soup.
    gid (Tn,) maps local rows to global triangle ids. Returns t, tri, u, v."""
    R = rays_o.shape[0]
    Tn = mesh_v0.shape[0]
    n_chunks = Tn // TRI_CHUNK

    def body(carry, ci):
        best_t, best_tri, best_u, best_v = carry
        sl = ci * TRI_CHUNK
        v0 = jax.lax.dynamic_slice_in_dim(mesh_v0, sl, TRI_CHUNK)
        e1 = jax.lax.dynamic_slice_in_dim(mesh_e1, sl, TRI_CHUNK)
        e2 = jax.lax.dynamic_slice_in_dim(mesh_e2, sl, TRI_CHUNK)
        ok = jax.lax.dynamic_slice_in_dim(mesh_valid, sl, TRI_CHUNK)
        gids = jax.lax.dynamic_slice_in_dim(gid, sl, TRI_CHUNK)

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
        best_tri = jnp.where(better, gids[j], best_tri)
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


def _trace_block_culled(mesh: MeshData, rays_o, rays_d, t_min, t_far, cull_cap):
    """Nearest hit for one ray block with Morton-cluster AABB pre-cull.

    Slab-tests every cluster AABB against every ray in the block, keeps
    clusters any ray may hit (block-coherent rays cull most), compacts the
    survivor ids to a static cull_cap list, then runs Moller-Trumbore only on
    those clusters' triangles. Returns (t, tri, u, v, n_dropped)."""
    R = rays_o.shape[0]
    NC = mesh.n_clusters

    # Ray-AABB slab test, (R, NC). Axis-parallel directions use a large
    # finite reciprocal (1e12) — inf would make 0*inf NaN on exact-boundary
    # origins and silently cull the cluster.
    d_safe = jnp.where(
        jnp.abs(rays_d) > 1e-12, rays_d, jnp.where(rays_d >= 0, 1e-12, -1e-12)
    )
    inv = 1.0 / d_safe
    t1 = (mesh.cluster_lo[None] - rays_o[:, None]) * inv[:, None]  # (R, NC, 3)
    t2 = (mesh.cluster_hi[None] - rays_o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (R, NC)
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit_c = (tf >= jnp.maximum(tn, t_min)) & (tn <= t_far)
    # Padding clusters carry inverted AABBs (lo=+inf, hi=-inf), which the
    # slab test PASSES for every ray (tn=-inf, tf=+inf): without this mask
    # they fill the cull_cap survivor list and evict real occluders at
    # production capacities (mesh padded to mesh_tri_capacity).
    cluster_ok = jnp.all(mesh.cluster_lo <= mesh.cluster_hi, axis=-1)  # (NC,)
    any_hit = jnp.any(hit_c, axis=0) & cluster_ok  # (NC,)

    # Compact survivor cluster ids to cull_cap (ascending; padding id = NC).
    idx = jnp.where(any_hit, jnp.arange(NC, dtype=jnp.int32), NC)
    if cull_cap > NC:  # pad so the static slice below is well-formed
        idx = jnp.concatenate([idx, jnp.full(cull_cap - NC, NC, jnp.int32)])
    sel = jnp.sort(idx)[:cull_cap]  # (K,)
    n_surv = jnp.sum(any_hit.astype(jnp.int32))
    n_dropped = jnp.maximum(n_surv - cull_cap, 0)
    live = sel < NC
    safe = jnp.minimum(sel, NC - 1)

    def gather(arr):  # (NC*CLUSTER, ...) -> (K*CLUSTER, ...)
        a = arr.reshape(NC, CLUSTER, *arr.shape[1:])[safe]
        return a.reshape(cull_cap * CLUSTER, *arr.shape[1:])

    v0s = gather(mesh.v0)
    e1s = gather(mesh.e1)
    e2s = gather(mesh.e2)
    oks = gather(mesh.valid) & jnp.repeat(live, CLUSTER)
    gids = (safe[:, None] * CLUSTER + jnp.arange(CLUSTER)[None, :]).reshape(-1)
    t, tri, u, v = _trace_block(v0s, e1s, e2s, oks, gids, rays_o, rays_d, t_min, t_far)
    return t, tri, u, v, n_dropped


def trace(
    mesh: MeshData,
    rays_o: jax.Array,  # (..., 3)
    rays_d: jax.Array,  # (..., 3) need not be unit; t is in units of |d|
    t_min: float = 1e-3,
    t_far: float = T_FAR,
    use_cull: bool = True,
    cull_cap: int | None = None,
    ray_block: int | None = None,
    block_mask: jax.Array | None = None,  # (R/per_block,) bool
):
    """Nearest-hit trace. Returns dict with
      pos (..., 3), normal (..., 3), depth (...,), tri (...,), bary (..., 2),
      cull_dropped () int (clusters beyond cull_cap; 0 = exact).
    Miss: depth = t_far, tri = -1, pos = o + t_far * d, normal = 0
    (matching raytracer.py trace(): positions advance to far, depth 10).

    use_cull enables the Morton-cluster AABB pre-cull: exact as long as
    cull_dropped == 0. cull_cap (default 64 clusters = 4096 triangles per
    256-ray block) bounds the per-block survivor list; callers should check
    cull_dropped and re-trace with a larger cap when it is nonzero.

    block_mask=False blocks report a miss for every ray without running the
    intersection scan (the block map is a lax.scan, so lax.cond genuinely
    skips the work) — callers whose downstream use is alpha-gated (the
    reference traces only render_alpha > 0 pixels, refl_utils.py:319-330)
    mask whole background ray blocks this way. Requires the ray count to be
    a multiple of the block size (pre-bundled callers)."""
    shape = rays_o.shape[:-1]
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    R = o.shape[0]
    NC = mesh.n_clusters
    per_block = ray_block or (256 if use_cull else RAY_BLOCK)
    R_pad = max(per_block, ((R + per_block - 1) // per_block) * per_block)
    o = jnp.concatenate([o, jnp.zeros((R_pad - R, 3))], 0)
    d = jnp.concatenate([d, jnp.ones((R_pad - R, 3))], 0)
    n_blk = R_pad // per_block
    if block_mask is None:
        mask = jnp.ones((n_blk,), bool)
    else:
        assert R == R_pad and block_mask.shape == (n_blk,), (
            R, R_pad, block_mask.shape, n_blk)
        mask = block_mask

    def _miss(Rb):
        return (
            jnp.full((Rb,), jnp.inf),
            jnp.full((Rb,), -1, jnp.int32),
            jnp.zeros((Rb,)),
            jnp.zeros((Rb,)),
        )

    if use_cull:
        gran = TRI_CHUNK // CLUSTER
        cap = cull_cap or min(NC, 64)
        cap = min(max(((cap + gran - 1) // gran) * gran, gran), ((NC + gran - 1) // gran) * gran)

        def blk(args):
            o_b, d_b, m_b = args
            return jax.lax.cond(
                m_b,
                lambda: _trace_block_culled(mesh, o_b, d_b, t_min, t_far, cap),
                lambda: (*_miss(per_block), jnp.int32(0)),
            )

        t, tri, u, v, ndrop = jax.lax.map(
            blk,
            (o.reshape(n_blk, per_block, 3), d.reshape(n_blk, per_block, 3), mask),
        )
        cull_dropped = jnp.sum(ndrop)
    else:
        gid = jnp.arange(mesh.n_tris, dtype=jnp.int32)

        def blk(args):
            o_b, d_b, m_b = args
            return jax.lax.cond(
                m_b,
                lambda: _trace_block(
                    mesh.v0, mesh.e1, mesh.e2, mesh.valid, gid,
                    o_b, d_b, t_min, t_far,
                ),
                lambda: _miss(per_block),
            )

        t, tri, u, v = jax.lax.map(
            blk,
            (o.reshape(n_blk, per_block, 3), d.reshape(n_blk, per_block, 3), mask),
        )
        cull_dropped = jnp.int32(0)
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
        "cull_dropped": cull_dropped,
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
    cull_cap: int | None = None,
) -> dict:
    """One-bounce indirect light at surface points (raytracer.py:274-300
    shade + refl_utils.py:120-150): reflect the view ray, nearest-hit the
    mesh, and return the color seen along the bounce plus visibility.

    Returns {indirect (..., 3), visibility (..., 1), depth (...,),
    cull_dropped ()}."""
    incident = normalize(reflect(rays_v, rays_n))
    hit = trace(mesh, surface_pos, incident, cull_cap=cull_cap)
    indirect = secondary_color(mesh, envmap, hit, incident)
    vis = (hit["depth"] >= T_FAR).astype(jnp.float32)[..., None]
    return {
        "indirect": indirect,
        "visibility": vis,
        "depth": hit["depth"],
        "cull_dropped": hit["cull_dropped"],
    }


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
