"""Core transform math: quaternions, rotations, activations, color spaces.

Numerical contracts mirror the reference's utils/general_utils.py and
utils/graphics_utils.py (behavioral parity, fresh JAX implementation):
  - quat_to_rotmat: reference utils/general_utils.py:78 (build_rotation),
    quaternion in (w, x, y, z) order, normalized first.
  - inverse_sigmoid: utils/general_utils.py.
  - expon_lr: utils/general_utils.py:29 (get_expon_lr_func).
  - srgb <-> linear: utils/graphics_utils.py:102-119.
  - rotation_between_z: utils/graphics_utils.py:121.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis`, safe at zero INCLUDING gradients.

    Never use jnp.linalg.norm here: d(sqrt)/dx at 0 is inf, and inf * 0
    cotangents produce NaN grads for exactly-zero vectors (e.g. background
    pixels in depth_to_normal). rsqrt of the clamped square-sum keeps the
    backward finite (the clamp's zero-branch gradient kills the inf).
    """
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps * eps))


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) in (w, x, y, z) order -> rotation matrix (..., 3, 3).

    The quaternion is normalized first, matching the reference's rotation
    activation (torch.nn.functional.normalize then build_rotation).
    """
    q = normalize(q, axis=-1)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    r1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) (w, x, y, z).

    Branch-free Shepperd-style conversion (jit friendly).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Branchlessly build the quaternion from all four Shepperd pivots and
    # select the largest-pivot candidate: the magnitude+copysign shortcut
    # mis-signs components at/near 180-degree rotations where the
    # off-diagonal differences vanish (e.g. R = pi about (1,-1,0) would
    # reconstruct with error 2.0).
    c_w = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    c_x = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    c_y = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    c_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)
    pivots = jnp.stack(
        [1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c_w, c_x, c_y, c_z], axis=-2)  # (..., 4 pivots, 4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    return normalize(q, axis=-1)


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.log(x / (1 - x))


def expon_lr(
    step: jax.Array | int,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
) -> jax.Array:
    """Log-linear lr interpolation with optional delayed warmup.

    Matches reference get_expon_lr_func (utils/general_utils.py:29), including
    the 0-lr behavior when step < 0 or lr_init == lr_final == 0.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(
        math.log(max(lr_init, 1e-32)) * (1 - t) + math.log(max(lr_final, 1e-32)) * t
    )
    out = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, out)


def linear_to_srgb(linear: jax.Array, eps: float | None = None) -> jax.Array:
    if eps is None:
        eps = float(jnp.finfo(jnp.float32).eps)
    srgb0 = 323 / 25 * linear
    srgb1 = (211 * jnp.maximum(linear, eps) ** (5 / 12) - 11) / 200
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb: jax.Array, eps: float | None = None) -> jax.Array:
    if eps is None:
        eps = float(jnp.finfo(jnp.float32).eps)
    linear0 = 25 / 323 * srgb
    linear1 = jnp.maximum((200 * srgb + 11) / 211, eps) ** (12 / 5)
    return jnp.where(srgb <= 0.04045, linear0, linear1)


def rotation_between_z(vec: jax.Array) -> jax.Array:
    """Rotation matrices aligning +z to `vec` (..., 3) -> (..., 3, 3).

    Mirrors reference utils/graphics_utils.py:121 including the -I fallback
    for vec ~ -z.
    """
    v1 = -vec[..., 1]
    v2 = vec[..., 0]
    cos_p_1 = jnp.maximum(vec[..., 2] + 1, 1e-7)
    z = jnp.zeros_like(v1)
    v11, v22 = v1 * v1, v2 * v2
    v12 = v1 * v2
    R = jnp.stack(
        [
            jnp.stack([1 + (-v22) / cos_p_1, v12 / cos_p_1, v2], axis=-1),
            jnp.stack([v12 / cos_p_1, 1 + (-v11) / cos_p_1, -v1], axis=-1),
            jnp.stack([-v2, v1, 1 + (-v22 - v11) / cos_p_1], axis=-1),
        ],
        axis=-2,
    )
    neg_eye = -jnp.eye(3, dtype=vec.dtype)
    return jnp.where(
        (vec[..., 2] + 1 > 0)[..., None, None], R, jnp.broadcast_to(neg_eye, R.shape)
    )


def flip_align_view(normal: jax.Array, viewdir: jax.Array):
    """Flip normals to face the viewer.

    normal: (..., 3) world normals; viewdir: (..., 3) point->camera directions.
    Returns (flipped_normal, flip_mask). Mirrors utils/general_utils.py:184.
    """
    dotprod = jnp.sum(normal * viewdir, axis=-1, keepdims=True)
    flipped = jnp.where(dotprod < 0, -normal, normal)
    return flipped, dotprod < 0


def reflect(viewdir: jax.Array, normal: jax.Array) -> jax.Array:
    """Reflect direction about normal: r = 2(n.v)n - v for v pointing away from
    surface, matching reference utils/refl_utils.py reflection()."""
    dotp = jnp.sum(viewdir * normal, axis=-1, keepdims=True)
    return 2 * dotp * normal - viewdir
