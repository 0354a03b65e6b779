"""Mesh tracer (raytracing_brdf replacement) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.ops import mesh_tracer as mt


def _icosphere(sub=2, radius=1.0):
    """Tiny icosphere generator (vertices, triangles)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(sub):
        mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                verts.append((np.asarray(verts[a]) + verts[b]) / 2.0)
                mid[key] = len(verts) - 1
            return mid[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.array(new_faces)
        verts = np.array(verts)
    verts = verts / np.linalg.norm(verts, axis=-1, keepdims=True) * radius
    return verts.astype(np.float32), faces.astype(np.int32)


def _brute_force_hit(verts, faces, o, d, t_min=1e-3, t_far=10.0):
    """Numpy Moller-Trumbore over all triangles, nearest hit."""
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    h = np.cross(d[None], e2)
    a = np.sum(e1 * h, -1)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = np.where(np.abs(a) > 1e-9, 1.0 / a, 0.0)
        s = o[None] - v0
        u = f * np.sum(s * h, -1)
        q = np.cross(s, e1)
        v = f * np.sum(d[None] * q, -1)
        t = f * np.sum(e2 * q, -1)
    hit = (np.abs(a) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= t_min) & (t < t_far)
    t = np.where(hit, t, np.inf)
    j = int(np.argmin(t))
    return (t[j], j) if np.isfinite(t[j]) else (t_far, -1)


@pytest.fixture(scope="module")
def sphere():
    verts, faces = _icosphere(2)
    return verts, faces, mt.build_mesh(verts, faces)


def test_trace_matches_brute_force(sphere):
    verts, faces, mesh = sphere
    rng = np.random.default_rng(0)
    # Rays from random outside points toward (near) the origin, plus misses.
    o = rng.normal(size=(64, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, -1, keepdims=True) * 3.0
    target = rng.normal(size=(64, 3)).astype(np.float32) * 0.4
    d = target - o
    d = (d / np.linalg.norm(d, -1, keepdims=True)).astype(np.float32)
    d[::7] = -d[::7]  # every 7th ray points away -> miss

    res = jax.jit(lambda oo, dd: mt.trace(mesh, oo, dd))(o, d)
    for i in range(64):
        t_ref, j_ref = _brute_force_hit(verts, faces, o[i], d[i])
        assert abs(float(res["depth"][i]) - t_ref) < 1e-4, i
        if j_ref < 0:
            assert int(res["tri"][i]) == -1
            np.testing.assert_allclose(np.asarray(res["normal"][i]), 0.0)
        else:
            assert int(res["tri"][i]) == j_ref, i
            # Hit point lies on the unit sphere (within mesh facet error).
            r = np.linalg.norm(np.asarray(res["pos"][i]))
            assert 0.9 < r < 1.01


def test_trace_nearest_of_two_parallel_quads():
    # Two parallel unit quads at z=1 and z=2; ray down +z must hit z=1.
    quad = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    verts = np.concatenate([quad + [0, 0, 1], quad + [0, 0, 2]]).astype(np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    mesh = mt.build_mesh(verts, faces)
    res = mt.trace(mesh, jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]))
    assert abs(float(res["depth"][0]) - 1.0) < 1e-5
    assert int(res["tri"][0]) in (0, 1)


def test_barycentric_interpolation_exact():
    # A linear function over one triangle is reproduced exactly at hits.
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    lin = (verts @ np.array([[1.0], [2.0], [0.0]], np.float32)) + 3.0  # f = x + 2y + 3
    mesh = mt.build_mesh(verts, faces, attrs={"f": lin})
    pts = np.array([[0.3, 0.4], [1.0, 0.5], [0.1, 1.7]], np.float32)
    o = np.concatenate([pts, np.full((3, 1), -1.0, np.float32)], -1)
    d = np.tile(np.array([[0, 0, 1.0]], np.float32), (3, 1))
    res = mt.trace(mesh, o, d)
    f = mt.interpolate_attr(mesh, "f", res["tri"], res["bary"])
    expect = pts[:, 0] + 2 * pts[:, 1] + 3
    np.testing.assert_allclose(np.asarray(f[:, 0]), expect, atol=1e-5)


def test_trace_t_in_units_of_dir_norm():
    verts = np.array([[-1, -1, 2], [1, -1, 2], [0, 1, 2]], np.float32)
    mesh = mt.build_mesh(verts, np.array([[0, 1, 2]], np.int32))
    res = mt.trace(mesh, jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 4.0]]))
    assert abs(float(res["depth"][0]) - 0.5) < 1e-6  # t scaled by |d|=4


def test_shade_one_bounce_miss_is_pure_env(sphere):
    verts, faces, mesh = sphere
    from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams

    env = EnvLightParams.create(16)
    env = env.replace(base=env.base + 1.5)
    mips = EnvLightMips.build_jit(env)

    # Surface point on +x sphere pole, normal +x, view from +x:
    # reflection goes back out along +x -> miss -> pure env along +x.
    pos = jnp.array([[1.001, 0.0, 0.0]])
    n = jnp.array([[1.0, 0.0, 0.0]])
    v = jnp.array([[1.0, 0.0, 0.0]])
    out = mt.shade_one_bounce(mesh, mips, pos, n, v)
    assert float(out["visibility"][0, 0]) == 1.0
    expect = mips(jnp.array([[1.0, 0.0, 0.0]]), mode="pure_env")
    np.testing.assert_allclose(
        np.asarray(out["indirect"][0]), np.asarray(expect[0]), atol=1e-6
    )


def test_shade_one_bounce_hit_reports_occlusion(sphere):
    verts, faces, mesh = sphere
    attrs = {
        "diffuse": np.full((len(verts), 3), 0.25, np.float32),
        "albedo": np.full((len(verts), 3), 0.5, np.float32),
        "metallic": np.zeros((len(verts), 1), np.float32),
        "roughness": np.full((len(verts), 1), 0.8, np.float32),
        "normal": (verts * 0.5 + 0.5).astype(np.float32),
    }
    mesh = mt.build_mesh(verts, faces, attrs=attrs)
    from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams

    mips = EnvLightMips.build_jit(EnvLightParams.create(16))

    # Point inside the sphere: any bounce hits the shell -> visibility 0,
    # and with metallic=0 the hit color is exactly (1-m)*diffuse + spec >= diffuse.
    pos = jnp.array([[0.2, 0.0, 0.0]])
    n = jnp.array([[1.0, 0.0, 0.0]])
    v = jnp.array([[1.0, 0.0, 0.0]])
    out = mt.shade_one_bounce(mesh, mips, pos, n, v)
    assert float(out["visibility"][0, 0]) == 0.0
    assert float(out["depth"][0]) < 2.0
    assert np.all(np.isfinite(np.asarray(out["indirect"])))
    assert np.all(np.asarray(out["indirect"]) >= 0.25 - 1e-4)


def test_bake_vertex_attrs():
    from materialrefgs_tpu.models import gaussian_model as gm

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, -1, keepdims=True)
    model = gm.create_from_points(
        pts, np.full((100, 3), 0.5, np.float32), capacity=128,
        rng=np.random.default_rng(0),
    )
    verts, faces = _icosphere(1)
    attrs = mt.bake_vertex_attrs(model, verts)
    assert set(attrs) == {"diffuse", "albedo", "metallic", "roughness", "normal"}
    for v in attrs.values():
        assert v.shape[0] == len(verts) and np.all(np.isfinite(v))
    mesh = mt.build_mesh(verts, faces, attrs=attrs)
    res = mt.trace(mesh, jnp.array([[3.0, 0, 0]]), jnp.array([[-1.0, 0, 0]]))
    assert int(res["tri"][0]) >= 0
    a = mt.interpolate_attr(mesh, "albedo", res["tri"], res["bary"])
    assert np.all((np.asarray(a) > 0) & (np.asarray(a) < 1))


def test_mesh_indirect_maps_in_render_surfel():
    """Full residual-branch composition: rasterize -> mesh trace -> shade."""
    from materialrefgs_tpu.cameras import look_at_camera
    from materialrefgs_tpu.models import gaussian_model as gm
    from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig
    from materialrefgs_tpu.render.renderers import (
        RenderOptions, mesh_indirect_maps, render_surfel,
    )

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, -1, keepdims=True)
    model = gm.create_from_points(
        pts, np.full((200, 3), 0.6, np.float32), capacity=256,
        rng=np.random.default_rng(0),
    )
    cam = look_at_camera(
        np.array([0.0, 0.0, -3.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.8, 0.8, 32, 32,
    )
    mips = EnvLightMips.build_jit(EnvLightParams.create(16))
    opts = RenderOptions(
        indirect=True,
        raster=RasterizeConfig(pair_capacity=1 << 14, interpret=True),
    )

    pkg = render_surfel(model, cam, jnp.zeros(3), mips, opts)
    normal_map = pkg["rend_normal"] / jnp.maximum(pkg["rend_alpha"], 1e-6)

    verts, faces = _icosphere(1)
    mesh = mt.build_mesh(verts, faces, attrs=mt.bake_vertex_attrs(model, verts))
    maps = mesh_indirect_maps(
        mesh, cam, normal_map, pkg["surf_depth"][..., None], mips,
        render_alpha=pkg["rend_alpha"],
    )
    assert maps["visibility"].shape == (32, 32, 1)
    assert maps["indirect"].shape == (32, 32, 3)
    v = np.asarray(maps["visibility"])
    assert np.all((v == 0.0) | (v == 1.0))
    # Empty pixels must be fully visible with zero indirect.
    empty = np.asarray(pkg["rend_alpha"])[..., 0] <= 0
    assert np.all(v[empty] == 1.0)
    assert np.all(np.asarray(maps["indirect"])[empty] == 0.0)

    pkg2 = render_surfel(
        model, cam, jnp.zeros(3), mips, opts,
        visibility=maps["visibility"], traced_indirect=maps["indirect"],
    )
    assert np.all(np.isfinite(np.asarray(pkg2["render"])))
    assert "indirect_color" in pkg2


def test_culled_trace_matches_brute(sphere):
    """The Morton-cluster pre-cull must be exact when nothing is dropped."""
    _, _, sphere = sphere
    rng = np.random.default_rng(11)
    R = 700
    o = rng.normal(size=(R, 3)).astype(np.float32) * 0.2 + np.array([0, 0, -3], np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d[:, 2] += 2.0  # bias toward the sphere
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    brute = mt.trace(sphere, jnp.asarray(o), jnp.asarray(d), use_cull=False)
    culled = mt.trace(sphere, jnp.asarray(o), jnp.asarray(d), use_cull=True)
    assert int(culled["cull_dropped"]) == 0
    np.testing.assert_array_equal(
        np.asarray(brute["tri"]), np.asarray(culled["tri"])
    )
    np.testing.assert_allclose(
        np.asarray(brute["depth"]), np.asarray(culled["depth"]), rtol=1e-6
    )


def test_culled_trace_cap_overflow_reported(sphere):
    """Undersized cull_cap must report dropped clusters, never silently."""
    verts, faces = _icosphere(3)  # 1280 tris -> 20 clusters (> min cap 8)
    sphere = mt.build_mesh(verts, faces)
    rng = np.random.default_rng(12)
    R = 256
    # Rays from everywhere through the whole sphere: every cluster survives.
    o = rng.normal(size=(R, 3)).astype(np.float32) * 3.0
    d = (-o / np.linalg.norm(o, axis=-1, keepdims=True)).astype(np.float32)
    out = mt.trace(sphere, jnp.asarray(o), jnp.asarray(d), use_cull=True, cull_cap=8)
    assert int(out["cull_dropped"]) > 0


def test_culled_trace_exact_with_heavy_padding():
    """Regression: padding clusters carry inverted AABBs (+inf/-inf) that the
    slab test passes for EVERY ray; without the cluster-valid mask they fill
    the cull_cap survivor list and evict real occluders (the trainer pads
    meshes to mesh_tri_capacity, so this is the production shape)."""
    verts, faces = _icosphere(2)  # 320 tris -> 5 real clusters
    # Pad way past the real geometry: 16384 tris -> 256 clusters, 251 padding.
    padded = mt.build_mesh(verts, faces, pad_to=16384)
    rng = np.random.default_rng(13)
    R = 512
    o = rng.normal(size=(R, 3)).astype(np.float32) * 0.2 + np.array(
        [0, 0, -3], np.float32
    )
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d[:, 2] += 2.0
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    brute = mt.trace(padded, jnp.asarray(o), jnp.asarray(d), use_cull=False)
    # cull_cap 64 < 251 padding clusters: only the valid-cluster mask makes
    # the real 5 clusters survive.
    culled = mt.trace(
        padded, jnp.asarray(o), jnp.asarray(d), use_cull=True, cull_cap=64
    )
    assert int(culled["cull_dropped"]) == 0
    assert int(jnp.sum(brute["tri"] >= 0)) > 100  # workload sanity: real hits
    np.testing.assert_array_equal(
        np.asarray(brute["tri"]), np.asarray(culled["tri"])
    )


def test_trace_block_mask_skips_blocks(sphere):
    """block_mask=False blocks report a miss for every ray; True blocks are
    bit-identical to an unmasked trace."""
    verts, faces, mesh = sphere
    rng = np.random.default_rng(5)
    n_blk, per = 4, 256
    o = rng.normal(size=(n_blk * per, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, -1, keepdims=True) * 3.0
    d = (-o / np.linalg.norm(o, -1, keepdims=True)).astype(np.float32)

    full = mt.trace(mesh, o, d, ray_block=per)
    mask = jnp.asarray([True, False, False, True])
    part = mt.trace(mesh, o, d, ray_block=per, block_mask=mask)

    fd = np.asarray(full["depth"]).reshape(n_blk, per)
    pd = np.asarray(part["depth"]).reshape(n_blk, per)
    ft = np.asarray(full["tri"]).reshape(n_blk, per)
    pt = np.asarray(part["tri"]).reshape(n_blk, per)
    np.testing.assert_array_equal(pd[0], fd[0])
    np.testing.assert_array_equal(pd[3], fd[3])
    np.testing.assert_array_equal(pt[0], ft[0])
    # Masked blocks: all rays miss (depth = t_far sentinel, tri = -1).
    assert np.all(pd[1] == mt.T_FAR) and np.all(pd[2] == mt.T_FAR)
    assert np.all(pt[1] == -1) and np.all(pt[2] == -1)
