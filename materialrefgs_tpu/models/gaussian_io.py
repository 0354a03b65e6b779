"""Gaussian model PLY serialization (gaussian_model.py:490-529 save_ply,
:725-838 load_ply) plus env-light state (.map files — stored as .npz here
instead of torch state dicts).

Attribute layout matches construct_list_of_attributes (gaussian_model.py:470+)
exactly so reference-trained PLYs load and vice versa: x y z, nx ny nz,
nx2 ny2 nz2, f_dc_*, f_rest_* (channel-major), ind_dc_*, ind_rest_*,
ind_asg_* (param-major, 5x32), opacity, refl_strength, metalness, roughness,
ori_color_*, diffuse_color_*, scale_*, rot_*.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.models.env_light import EnvLightParams
from materialrefgs_tpu.models.gaussian_model import GaussianModel, GaussianParams
from materialrefgs_tpu.utils.ply import read_ply, write_ply


def save_ply(model: GaussianModel, path: str, env1: EnvLightParams | None = None, env2: EnvLightParams | None = None):
    alive = np.asarray(model.alive)
    p = model.params

    def take(x):
        return np.asarray(x)[alive]

    props: dict[str, np.ndarray] = {}
    xyz = take(p.xyz)
    for i, k in enumerate(("x", "y", "z")):
        props[k] = xyz[:, i]
    n1, n2 = take(p.normal1), take(p.normal2)
    for i, k in enumerate(("nx", "ny", "nz")):
        props[k] = n1[:, i]
    for i, k in enumerate(("nx2", "ny2", "nz2")):
        props[k] = n2[:, i]

    # (P, K, 3) -> channel-major flatten (P, 3*K) like torch transpose(1,2).
    # Explicit column count: reshape(-1) cannot infer the minor dim for an
    # EMPTY selection (0 alive rows — e.g. a collapsed env cloud) and a
    # failed save at the final iteration loses the whole run's artifact.
    def ch_major(a):
        return a.transpose(0, 2, 1).reshape(a.shape[0], a.shape[1] * a.shape[2])

    f_dc = ch_major(take(p.features_dc))
    f_rest = ch_major(take(p.features_rest))
    ind_dc = ch_major(take(p.indirect_dc))
    ind_rest = ch_major(take(p.indirect_rest))
    ind_asg = ch_major(take(p.indirect_asg))  # (P, 5*32)
    for i in range(f_dc.shape[1]):
        props[f"f_dc_{i}"] = f_dc[:, i]
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i]
    for i in range(ind_dc.shape[1]):
        props[f"ind_dc_{i}"] = ind_dc[:, i]
    for i in range(ind_rest.shape[1]):
        props[f"ind_rest_{i}"] = ind_rest[:, i]
    for i in range(ind_asg.shape[1]):
        props[f"ind_asg_{i}"] = ind_asg[:, i]
    props["opacity"] = take(p.opacity)[:, 0]
    props["refl_strength"] = take(p.refl_strength)[:, 0]
    props["metalness"] = take(p.metalness)[:, 0]
    props["roughness"] = take(p.roughness)[:, 0]
    oc, dc = take(p.ori_color), take(p.diffuse_color)
    for i in range(3):
        props[f"ori_color_{i}"] = oc[:, i]
    for i in range(3):
        props[f"diffuse_color_{i}"] = dc[:, i]
    sc, rt = take(p.scaling), take(p.rotation)
    for i in range(sc.shape[1]):
        props[f"scale_{i}"] = sc[:, i]
    for i in range(rt.shape[1]):
        props[f"rot_{i}"] = rt[:, i]
    write_ply(path, props)

    if env1 is not None:
        np.savez(path.replace(".ply", "1.map.npz"), base=np.asarray(env1.base))
    if env2 is not None:
        np.savez(path.replace(".ply", "2.map.npz"), base=np.asarray(env2.base))


def load_ply(path: str, capacity: int | None = None, max_sh_degree: int = 3):
    """Returns (GaussianModel, env1 | None, env2 | None)."""
    from materialrefgs_tpu.data import native_io

    v = native_io.read_ply_f32(path)  # native fast path (C++)
    if v is None:
        v = read_ply(path)
    P = len(v["x"])
    cap = capacity or int(2 ** np.ceil(np.log2(max(P, 1))))
    assert P <= cap
    K = (max_sh_degree + 1) ** 2

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:P] = x
        return jnp.asarray(out)

    def stack(names):
        return np.stack([v[n] for n in names], axis=1).astype(np.float32)

    def series(prefix, n):
        return stack([f"{prefix}_{i}" for i in range(n)])

    xyz = stack(["x", "y", "z"])
    f_dc = series("f_dc", 3).reshape(P, 3, 1).transpose(0, 2, 1)
    f_rest = series("f_rest", 3 * (K - 1)).reshape(P, 3, K - 1).transpose(0, 2, 1)
    ind_dc = series("ind_dc", 3).reshape(P, 3, 1).transpose(0, 2, 1)
    ind_rest = series("ind_rest", 3 * (K - 1)).reshape(P, 3, K - 1).transpose(0, 2, 1)
    ind_asg = series("ind_asg", 160).reshape(P, 5, 32).transpose(0, 2, 1)

    params = GaussianParams(
        xyz=pad(xyz),
        scaling=pad(series("scale", 2), fill=-10.0),
        rotation=pad(series("rot", 4)).at[P:, 0].set(1.0),
        opacity=pad(v["opacity"][:, None].astype(np.float32), fill=-15.0),
        refl_strength=pad(v["refl_strength"][:, None].astype(np.float32)),
        metalness=pad(v["metalness"][:, None].astype(np.float32)),
        roughness=pad(v["roughness"][:, None].astype(np.float32)),
        ori_color=pad(series("ori_color", 3)),
        diffuse_color=pad(series("diffuse_color", 3)),
        features_dc=pad(f_dc),
        features_rest=pad(f_rest),
        indirect_dc=pad(ind_dc),
        indirect_rest=pad(ind_rest),
        indirect_asg=pad(ind_asg),
        normal1=pad(stack(["nx", "ny", "nz"])),
        normal2=pad(stack(["nx2", "ny2", "nz2"])),
    )
    model = GaussianModel(
        params=params,
        alive=jnp.arange(cap) < P,
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_gradient_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
        active_sh_degree=jnp.int32(max_sh_degree),
        max_sh_degree=max_sh_degree,
        capacity=cap,
    )

    env1 = env2 = None
    p1 = path.replace(".ply", "1.map.npz")
    p2 = path.replace(".ply", "2.map.npz")
    if os.path.exists(p1):
        env1 = EnvLightParams(base=jnp.asarray(np.load(p1)["base"]))
    if os.path.exists(p2):
        env2 = EnvLightParams(base=jnp.asarray(np.load(p2)["base"]))
    return model, env1, env2
