"""Pallas tile kernel vs pure-jnp reference: forward parity."""
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from materialrefgs_tpu.ops.rasterize.reference import rasterize_reference

CFG = RasterizeConfig(pair_capacity=1 << 14, interpret=True)


def make_cam(W=48, H=32):
    return look_at_camera(
        eye=np.array([0.0, 0.0, -4.0]),
        target=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]),
        fovx=0.9,
        fovy=0.7,
        width=W,
        height=H,
    )


def random_scene(rng, P=96):
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.6
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.5 - 1.6)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = rng.uniform(size=(P, 6)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats))


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_reference(seed):
    rng = np.random.default_rng(seed)
    cam = make_cam()
    means, scales, rots, opac, colors, feats = random_scene(rng)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)

    ref = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
    out = rasterize(means, scales, rots, opac, colors, feats, cam, bg, config=CFG)

    for key, tol in [
        ("render", 2e-4),
        ("feature", 2e-4),
        ("normal", 2e-4),
        ("depth", 1e-3),
        ("alpha", 2e-4),
        ("final_T", 2e-4),
        ("M1", 2e-4),
        ("M2", 2e-4),
        ("distortion", 5e-4),
        ("median_depth", 1e-3),
    ]:
        np.testing.assert_allclose(
            np.asarray(out[key]),
            np.asarray(ref[key]),
            atol=tol,
            rtol=1e-3,
            err_msg=f"mismatch in {key}",
        )
    np.testing.assert_array_equal(
        np.asarray(out["n_contrib"]), np.asarray(ref["n_contrib"])
    )


def test_nonmultiple_image_size():
    rng = np.random.default_rng(2)
    cam = make_cam(W=41, H=29)  # not multiples of 16
    means, scales, rots, opac, colors, feats = random_scene(rng, P=48)
    bg = jnp.zeros(3, jnp.float32)
    ref = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
    out = rasterize(means, scales, rots, opac, colors, feats, cam, bg, config=CFG)
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.asarray(ref["render"]), atol=3e-4, rtol=1e-3
    )
    assert out["render"].shape == (29, 41, 3)


def test_binning_int32_wrap_reports_loud_overflow():
    """Pathological pair totals that wrap int32 (optimizer blow-up inflating
    scales) must report a huge positive overflow — never a negative one that
    would mute the trainer's capacity escalation."""
    from materialrefgs_tpu.ops.rasterize import binning
    from materialrefgs_tpu.ops.rasterize.preprocess import PreprocessOut

    P = 4
    big = np.int32(2**30)  # 4 * 2^30 wraps int32
    pre = PreprocessOut(
        T_rows=jnp.zeros((P, 3, 3)),
        normal=jnp.zeros((P, 3)),
        depth=jnp.arange(P, dtype=jnp.float32),
        mean2d=jnp.zeros((P, 2)),
        radius=jnp.ones(P),
        rect_min=jnp.zeros((P, 2), jnp.int32),
        rect_max=jnp.full((P, 2), 2, jnp.int32),
        tiles_touched=jnp.full((P,), big, jnp.int32),
        valid=jnp.ones(P, bool),
    )
    bins = binning.bin_pairs(pre, grid_x=4, grid_y=4, pair_capacity=256)
    assert int(bins.overflow) > 0, int(bins.overflow)
