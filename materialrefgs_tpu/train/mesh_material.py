"""Material-textured mesh export + optimizable vertex albedo.

Two reference capabilities live here:

1. The material-textured mesh PLY (utils/mesh_utils.py:255-310
   `extract_mesh_bouned_with_material`): one PLY whose vertex element
   carries rgb + normal + diffuse + albedo + metallic + roughness fields.
   The reference re-runs TSDF fusion once per attribute map and asserts the
   six meshes share vertices; here the attributes are baked directly onto
   the single extracted mesh's vertices (ops.mesh_tracer.bake_vertex_attrs),
   which is exact for vertex attributes and 6x cheaper.

2. The optimizable mesh ray tracer's vertex-albedo refinement
   (raytracing_brdf/raytracer_optimizable.py:46-50: albedo stored as
   inverse-sigmoid logits under an Adam optimizer). TPU-native form: a
   jitted optax step differentiating the one-bounce indirect render w.r.t.
   the albedo logits.
"""
from __future__ import annotations

import numpy as np

# PLY vertex-field layout (reference mesh_utils.py:278-296). Normals are
# stored in [-1, 1] on disk (the reference writes vertex_colors*2-1);
# MeshData.attrs keeps them in [0, 1] (mesh_tracer.interpolate convention).
_FIELDS = (
    ["x", "y", "z"]
    + ["red", "green", "blue"]
    + ["normal_x", "normal_y", "normal_z"]
    + ["diffuse_r", "diffuse_g", "diffuse_b"]
    + ["albedo_r", "albedo_g", "albedo_b"]
    + ["metallic_0"]
    + ["roughness_0"]
)


def write_material_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                            attrs: dict, rgb: np.ndarray | None = None):
    """Write the multi-attribute vertex PLY. `attrs` is the
    bake_vertex_attrs dict (diffuse/albedo/metallic/roughness (V,C) +
    normal in [0,1]); `rgb` is the fused render color (defaults to
    diffuse)."""
    import os

    V = len(verts)
    if rgb is None:
        rgb = attrs["diffuse"]
    cols = np.concatenate(
        [
            np.asarray(verts, np.float32),
            np.asarray(rgb, np.float32),
            np.asarray(attrs["normal"], np.float32) * 2.0 - 1.0,
            np.asarray(attrs["diffuse"], np.float32),
            np.asarray(attrs["albedo"], np.float32),
            np.asarray(attrs["metallic"], np.float32).reshape(V, 1),
            np.asarray(attrs["roughness"], np.float32).reshape(V, 1),
        ],
        axis=-1,
    ).astype("<f4")
    assert cols.shape == (V, len(_FIELDS))

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {V}\n".encode())
        for name in _FIELDS:
            f.write(f"property float {name}\n".encode())
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(cols.tobytes())
        fdata = np.empty(len(faces), dtype=[("n", "u1"), ("v", "<i4", 3)])
        fdata["n"] = 3
        fdata["v"] = np.asarray(faces, np.int32)
        f.write(fdata.tobytes())


def read_material_mesh_ply(path: str):
    """Read a material mesh PLY (this writer's layout, or any float-vertex
    PLY using the reference's `{prefix}_{suffix}` field grouping,
    raytracer_optimizable.py:66-81). Returns (verts, faces, attrs) with
    attrs in MeshData conventions (normal back in [0, 1])."""
    with open(path, "rb") as f:
        n_vert = n_face = 0
        names = []
        in_vertex = False
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n_vert = int(line.split()[-1])
                in_vertex = True
            elif line.startswith("element face"):
                n_face = int(line.split()[-1])
                in_vertex = False
            elif line.startswith("property float") and in_vertex:
                names.append(line.split()[-1])
            elif line == "end_header":
                break
        data = np.frombuffer(
            f.read(n_vert * 4 * len(names)), dtype="<f4"
        ).reshape(n_vert, len(names))
        fdt = np.dtype([("n", "u1"), ("v", "<i4", 3)])
        faces = np.frombuffer(f.read(n_face * fdt.itemsize), dtype=fdt)["v"]

    col = {n: i for i, n in enumerate(names)}

    def grab(*fields):
        return data[:, [col[f] for f in fields]].copy()

    verts = grab("x", "y", "z")
    attrs = {}
    if "normal_x" in col:
        attrs["normal"] = grab("normal_x", "normal_y", "normal_z") * 0.5 + 0.5
    if "diffuse_r" in col:
        attrs["diffuse"] = grab("diffuse_r", "diffuse_g", "diffuse_b")
    if "albedo_r" in col:
        attrs["albedo"] = grab("albedo_r", "albedo_g", "albedo_b")
    if "metallic_0" in col:
        attrs["metallic"] = grab("metallic_0")
    if "roughness_0" in col:
        attrs["roughness"] = grab("roughness_0")
    return verts, faces.astype(np.int32).copy(), attrs


def make_vertex_albedo_step(mesh, envmap, lr: float = 1e-6):
    """Optimizable vertex albedo (raytracer_optimizable.py:46-50): albedo
    lives as inverse-sigmoid logits under Adam; each step renders the
    one-bounce indirect color at given surface samples and descends an L1
    to the target.

    Returns (init_state, step) with
      init_state = (logits (V, 3), opt_state)
      step(state, surface_pos, rays_n, rays_v, target) -> (state, loss).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from materialrefgs_tpu.ops.mesh_tracer import shade_one_bounce
    from materialrefgs_tpu.utils.transforms import inverse_sigmoid

    tx = optax.adam(lr)
    logits0 = inverse_sigmoid(
        jnp.clip(jnp.asarray(mesh.attrs["albedo"], jnp.float32), 1e-4, 1 - 1e-4)
    )
    state0 = (logits0, tx.init(logits0))
    metallic = jnp.asarray(mesh.attrs.get("metallic", np.zeros((logits0.shape[0], 1))))

    def loss_fn(logits, surface_pos, rays_n, rays_v, target):
        albedo = jax.nn.sigmoid(logits)
        attrs = dict(mesh.attrs)
        attrs["albedo"] = albedo
        attrs["diffuse"] = (1.0 - metallic) * albedo
        m = mesh.replace(attrs=attrs)
        out = shade_one_bounce(m, envmap, surface_pos, rays_n, rays_v)
        return jnp.mean(jnp.abs(out["indirect"] - target))

    @jax.jit
    def step(state, surface_pos, rays_n, rays_v, target):
        logits, opt_state = state
        loss, g = jax.value_and_grad(loss_fn)(
            logits, surface_pos, rays_n, rays_v, target
        )
        upd, opt_state = tx.update(g, opt_state, logits)
        return (optax.apply_updates(logits, upd), opt_state), loss

    return state0, step
