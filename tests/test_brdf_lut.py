import os

import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.ops.brdf_lut import compute_fg_lut, sample_fg_lut

REF_BIN = "/root/reference/assets/bsdf_256_256.bin"


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="reference asset absent")
def test_lut_matches_reference_asset():
    ref = np.fromfile(REF_BIN, dtype=np.float32).reshape(256, 256, 2)
    ours = compute_fg_lut(n_samples=512)
    # Interior texels (corners are quadrature-noisy at extreme grazing angles).
    d = np.abs(ours - ref)[2:-2, 2:]
    assert d.mean() < 5e-3, d.mean()
    assert d.max() < 5e-2, d.max()


def test_sample_fg_lut_shapes():
    out = sample_fg_lut(jnp.array([0.5, 0.9]), jnp.array([0.1, 0.7]))
    assert out.shape == (2, 2)
    a = np.asarray(out)
    assert np.all((a >= 0) & (a <= 1.5))


def test_sample_fg_lut_clamps():
    lo = sample_fg_lut(jnp.array([-0.5]), jnp.array([0.2]))
    at0 = sample_fg_lut(jnp.array([0.0]), jnp.array([0.2]))
    np.testing.assert_allclose(np.asarray(lo), np.asarray(at0), atol=1e-6)
