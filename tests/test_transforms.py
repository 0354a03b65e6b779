import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from materialrefgs_tpu.utils import sh as sh_utils
from materialrefgs_tpu.utils.transforms import (
    inverse_sigmoid,
    linear_to_srgb,
    quat_to_rotmat,
    reflect,
    rotation_between_z,
    rotmat_to_quat,
    srgb_to_linear,
)


def test_quat_to_rotmat_matches_scipy(rng):
    q = rng.normal(size=(32, 4))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    # scipy uses (x, y, z, w)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R_ref = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rotmat_quat_roundtrip(rng):
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = quat_to_rotmat(jnp.asarray(q))
    q2 = rotmat_to_quat(R)
    R2 = quat_to_rotmat(q2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(1 / (1 + np.exp(-np.asarray(inverse_sigmoid(x))))),
        np.asarray(x),
        atol=1e-6,
    )


def test_srgb_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0.001, 1.0, size=(100,)), jnp.float32)
    y = srgb_to_linear(linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_rotation_between_z(rng):
    v = rng.normal(size=(50, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    R = np.asarray(rotation_between_z(jnp.asarray(v)))
    z = np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(R @ z, v, atol=1e-4)


def test_reflect():
    v = jnp.array([[0.0, 0.0, 1.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(reflect(v, n)), [[0, 0, 1.0]], atol=1e-6)
    v = jnp.array([[1.0, 0.0, 1.0]]) / np.sqrt(2)
    r = np.asarray(reflect(v, n))[0]
    np.testing.assert_allclose(r, [-1 / np.sqrt(2), 0, 1 / np.sqrt(2)], atol=1e-6)


def test_sh_degree0_constant(rng):
    shc = jnp.asarray(rng.normal(size=(5, 3, 1)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    out = sh_utils.eval_sh(0, shc, dirs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(shc[..., 0]) * sh_utils.C0, atol=1e-6
    )


@pytest.mark.parametrize("deg", [1, 2, 3, 4])
def test_sh_orthonormality(deg, rng):
    # Monte-Carlo check: E[basis_i * basis_j] over the sphere = delta_ij / (4pi)
    # One jitted vectorized evaluation: a python loop of eager jnp calls can
    # abort the multi-device XLA CPU client under pytest.
    import jax

    n = 50000
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    K = (deg + 1) ** 2

    @jax.jit
    def all_basis(dirs):
        eye = jnp.eye(K)  # (K basis "channels", K coeffs)
        return sh_utils.eval_sh(deg, eye[None, :, :], dirs[:, None, :])[:, 0, :]

    B = np.asarray(all_basis(jnp.asarray(d, jnp.float32)))  # (n, K)
    gram = B.T @ B / n * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(K), atol=0.25)


def test_rgb_sh_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(10, 3)), jnp.float32)
    back = sh_utils.sh_to_rgb_raw(sh_utils.rgb_to_sh(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-6)
