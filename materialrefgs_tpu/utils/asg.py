"""Anisotropic spherical gaussian (ASG) indirect-light lobes.

Mirrors init_predefined_omega (utils/graphics_utils.py:196-229) and the ASG
evaluation inlined in render_surfel (gaussian_renderer/__init__.py:318-338).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.utils.transforms import rotation_between_z


@functools.lru_cache(maxsize=4)
def init_predefined_omega(n_theta: int = 4, n_phi: int = 8):
    """Returns (omega, omega_lambda, omega_mu), each (n_theta*n_phi, 3)."""
    theta = np.arange(n_theta) * 0.5 * np.pi / n_theta + 0.5 * np.pi / (2 * n_theta)
    phi = np.arange(n_phi) * 2 * np.pi / n_phi + 2 * np.pi / (2 * n_phi)
    th, ph = np.meshgrid(theta, phi, indexing="ij")
    th, ph = th.reshape(-1), ph.reshape(-1)

    def sph(t, p):
        return np.stack(
            [np.cos(p) * np.sin(t), np.sin(p) * np.sin(t), np.cos(t)], axis=-1
        )

    omega = sph(th, ph)
    omega_la = sph(th + np.pi / 2, ph)
    # Rotating omega_la by pi/2 around omega (they are orthogonal) = cross.
    omega_mu = np.cross(omega, omega_la)
    # Cache NUMPY (jnp arrays created inside a jit trace must not be cached).
    return (
        omega.astype(np.float32),
        omega_la.astype(np.float32),
        omega_mu.astype(np.float32),
    )


def eval_asg_indirect(
    asg: jax.Array,  # (P, 32, 5) raw params [ep(3), la(1), mu(1)]
    normals: jax.Array,  # (P, 3) world, flipped toward viewer
    reflection: jax.Array,  # (P, 3) reflected view dirs, world
) -> jax.Array:
    """gaussian_renderer/__init__.py:318-338; returns (P, 3) >= 0."""
    om, om_la, om_mu = init_predefined_omega(4, 8)
    omega, omega_la, omega_mu = (jnp.asarray(a) for a in (om, om_la, om_mu))
    rot = jnp.swapaxes(rotation_between_z(normals), -1, -2)  # (P, 3, 3)
    refl_local = jnp.einsum("pij,pj->pi", rot, reflection)  # (P, 3)

    ep, la, mu = asg[..., :3], asg[..., 3:4], asg[..., 4:5]
    smooth = jax.nn.relu(
        jnp.sum(refl_local[:, None, :] * omega[None], axis=-1, keepdims=True)
    )
    ep = jnp.exp(ep - 3.0)
    la = jax.nn.softplus(la - 1.0)
    mu = jax.nn.softplus(mu - 1.0)
    dla = jnp.sum(omega_la[None] * refl_local[:, None, :], axis=-1, keepdims=True)
    dmu = jnp.sum(omega_mu[None] * refl_local[:, None, :], axis=-1, keepdims=True)
    out = ep * smooth * jnp.exp(-la * dla**2 - mu * dmu**2)
    return jnp.maximum(out.sum(axis=1), 0.0)
