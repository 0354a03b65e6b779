"""TSDF fusion + marching tetrahedra on a synthetic sphere."""
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.train import mesh_extract as me


def sphere_depth(camera, radius=1.0):
    """Analytic depth map of a unit-ish sphere at the origin."""
    import jax.numpy as jnp

    rays = np.asarray(camera.get_rays())  # camera-space, z=1
    R = np.asarray(camera.world_view)[:3, :3]
    d_world = rays @ R.T
    norm = np.linalg.norm(d_world, axis=-1)
    d_unit = d_world / norm[..., None]
    o = np.asarray(camera.camera_center)
    b = np.sum(d_unit * (-o), axis=-1)
    c = np.sum(o * o) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = b - np.sqrt(np.maximum(disc, 0))
    # Convert distance along unit ray to view-z depth (rays have z=1 in cam).
    depth = np.where(hit & (t > 0), t / norm, 0.0)
    alpha = np.where(hit & (t > 0), 1.0, 0.0)
    return depth.astype(np.float32), alpha.astype(np.float32)


def test_sphere_reconstruction():
    cams, depths, alphas = [], [], []
    for i in range(12):
        ang = 2 * np.pi * i / 12
        el = 0.4 * np.sin(3 * ang)
        eye = 3.0 * np.array([np.sin(ang), el, -np.cos(ang)])
        cam = look_at_camera(eye, np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.9, 0.9, 64, 64)
        d, a = sphere_depth(cam)
        cams.append(cam)
        depths.append(d)
        alphas.append(a)

    verts, faces = me.extract_mesh(cams, depths, alphas, resolution=64)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    # Reconstructed surface close to the unit sphere.
    assert abs(float(np.median(r)) - 1.0) < 0.15, float(np.median(r))
    assert float(np.std(r)) < 0.1


def test_sphere_reconstruction_unbounded():
    """Contracted-space extractor (refreal/tnt path, mesh_utils.py:309)
    recovers the same unit sphere."""
    cams, depths, alphas = [], [], []
    for i in range(12):
        ang = 2 * np.pi * i / 12
        el = 0.4 * np.sin(3 * ang)
        eye = 3.0 * np.array([np.sin(ang), el, -np.cos(ang)])
        cam = look_at_camera(eye, np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.9, 0.9, 64, 64)
        d, a = sphere_depth(cam)
        cams.append(cam)
        depths.append(d)
        alphas.append(a)

    verts, faces = me.extract_mesh_unbounded(cams, depths, alphas, resolution=96)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(float(np.median(r)) - 1.0) < 0.2, float(np.median(r))


def test_mesh_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.ply")
    me.write_mesh_ply(p, verts, faces)
    assert (tmp_path / "m.ply").stat().st_size > 0


def test_visibility_stable_when_resolution_doubles():
    """VERDICT r2 item 5 'Done' criterion: occlusion/visibility maps traced
    against the extracted mesh must be stable when the TSDF resolution
    doubles (the content crop + decimation pipeline preserves occluders)."""
    import jax.numpy as jnp

    from materialrefgs_tpu.ops import mesh_tracer as mt

    cams, depths, alphas = [], [], []
    for i in range(12):
        ang = 2 * np.pi * i / 12
        el = 0.4 * np.sin(3 * ang)
        eye = 3.0 * np.array([np.sin(ang), el, -np.cos(ang)])
        cam = look_at_camera(eye, np.zeros(3), np.array([0.0, 1.0, 0.0]), 0.9, 0.9, 64, 64)
        d, a = sphere_depth(cam)
        cams.append(cam)
        depths.append(d)
        alphas.append(a)

    vis = {}
    for res in (64, 128):
        verts, faces = me.extract_mesh(cams, depths, alphas, resolution=res)
        verts, faces = me.decimate_vertex_clustering(verts, faces, 4096)
        mesh = mt.build_mesh(verts, faces, pad_to=4096, pad_verts_to=4096)
        # Rays from a grid of origins on a plane at x=+2.5 toward -x: the
        # sphere occludes the center bundle, the rim passes.
        g = np.linspace(-1.6, 1.6, 32, dtype=np.float32)
        oy, oz = np.meshgrid(g, g, indexing="ij")
        o = np.stack([np.full_like(oy, 2.5), oy, oz], -1).reshape(-1, 3)
        dirs = np.tile(np.array([[-1.0, 0, 0]], np.float32), (len(o), 1))
        out = mt.trace(mesh, jnp.asarray(o), jnp.asarray(dirs))
        vis[res] = np.asarray(out["depth"]) >= 9.99  # miss sentinel ~10

    # Doubling resolution changes the visibility classification of <2% of rays.
    agree = float(np.mean(vis[64] == vis[128]))
    assert agree > 0.98, agree
    # And the sphere actually occludes ~pi r^2 / 3.2^2 = 0.31 of the grid.
    frac_occluded = 1.0 - float(np.mean(vis[128]))
    assert 0.22 < frac_occluded < 0.42, frac_occluded
