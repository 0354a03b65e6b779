"""Material mesh PLY roundtrip + optimizable vertex albedo
(reference utils/mesh_utils.py:255 and raytracing_brdf/raytracer_optimizable.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.models.env_light import EnvLightMips, EnvLightParams
from materialrefgs_tpu.ops import mesh_tracer as mt
from materialrefgs_tpu.train.mesh_material import (
    make_vertex_albedo_step,
    read_material_mesh_ply,
    write_material_mesh_ply,
)
from tests.test_mesh_tracer import _icosphere


def _attrs(rng, V):
    return {
        "normal": rng.uniform(size=(V, 3)).astype(np.float32),
        "diffuse": rng.uniform(size=(V, 3)).astype(np.float32),
        "albedo": rng.uniform(0.2, 0.8, size=(V, 3)).astype(np.float32),
        "metallic": rng.uniform(size=(V, 1)).astype(np.float32),
        "roughness": rng.uniform(size=(V, 1)).astype(np.float32),
    }


def test_material_ply_roundtrip(tmp_path, rng):
    verts, faces = _icosphere(sub=0)
    attrs = _attrs(rng, len(verts))
    p = str(tmp_path / "mat_mesh.ply")
    write_material_mesh_ply(p, verts, faces, attrs)
    v2, f2, a2 = read_material_mesh_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    for k in attrs:
        np.testing.assert_allclose(a2[k], attrs[k], atol=1e-6, err_msg=k)


def test_vertex_albedo_optimization(rng):
    """Adam on albedo logits reduces the one-bounce indirect L1 toward a
    target rendered with a different albedo (the raytracer_optimizable
    refinement loop)."""
    verts, faces = _icosphere(sub=1, radius=1.0)
    attrs = _attrs(rng, len(verts))
    attrs["metallic"][:] = 0.0  # pure diffuse bounce: loss is albedo-driven
    mesh = mt.build_mesh(verts, faces, attrs=attrs)
    env = EnvLightMips.build(EnvLightParams.create(16, init=0.3), n_samples=4)

    # Surface samples outside the sphere; pick normals so the reflected
    # rays aim at the origin by construction (n bisects view and incident).
    N = 64
    pos = np.stack(
        [np.full(N, 2.5), rng.uniform(-0.3, 0.3, N), rng.uniform(-0.3, 0.3, N)],
        -1,
    ).astype(np.float32)
    v = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (N, 1))
    incident = -pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    n = v + incident
    n = (n / np.linalg.norm(n, axis=-1, keepdims=True)).astype(np.float32)

    # Target: indirect render with brighter albedo.
    tgt_attrs = dict(attrs)
    tgt_attrs["albedo"] = np.clip(attrs["albedo"] + 0.2, 0, 1)
    tgt_attrs["diffuse"] = tgt_attrs["albedo"]
    tgt_mesh = mt.build_mesh(verts, faces, attrs=tgt_attrs)
    target = mt.shade_one_bounce(tgt_mesh, env, pos, n, v)["indirect"]
    assert float(jnp.mean(target)) > 0

    state, step = make_vertex_albedo_step(mesh, env, lr=5e-2)
    losses = []
    for _ in range(20):
        state, loss = step(state, pos, n, v, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
