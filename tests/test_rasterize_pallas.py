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
@pytest.mark.core
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


@pytest.mark.core
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


@pytest.mark.core
def test_tile_keep_mask_is_output_neutral():
    """Tight culling exactness: every tile bit CLEARED by tile_keep_mask must
    have max alpha < ALPHA_MIN over all its pixels — i.e. the pair could never
    pass the kernel's per-pixel test (forward.cu:397), so dropping it changes
    no composited output. Brute-forced against the reference per-pixel alpha
    on scenes with anisotropic, low-opacity, and near-edge-on splats."""
    from materialrefgs_tpu.ops.rasterize import binning
    from materialrefgs_tpu.ops.rasterize.layout import ALPHA_MIN
    from materialrefgs_tpu.ops.rasterize.preprocess import preprocess

    rng = np.random.default_rng(7)
    cam = make_cam(W=64, H=48)
    P = 160
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.7
    # Strongly anisotropic scales plus a batch of near-degenerate ones.
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 1.2 - 1.8)
    scales[:32, 0] *= 20.0  # extreme aspect ratios
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.01, 0.99, size=(P,)).astype(np.float32)

    pre = preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots), cam, 1.0
    )
    mask0, mask1, use_mask, tiles_kept = binning.tile_keep_mask(
        pre, jnp.asarray(opac)
    )
    # Per-pixel alpha WITHOUT any keep-mask coverage: recompute raw terms
    # independently (reference._per_gaussian_pixel_terms applies the keep
    # mask itself, so it cannot serve as the uncovered baseline here).
    from materialrefgs_tpu.ops.rasterize.layout import (
        ALPHA_MAX,
        FILTER_INV_SQUARE,
        NEAR_N,
    )

    H, W = 48, 64
    px = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    py = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    Tu = pre.T_rows[:, 0, :][:, None, None, :]
    Tv = pre.T_rows[:, 1, :][:, None, None, :]
    Tw = pre.T_rows[:, 2, :][:, None, None, :]
    k = px[..., None] * Tw - Tu
    l = py[..., None] * Tw - Tv
    p = jnp.cross(k, l)
    pz = p[..., 2]
    pz_safe = jnp.where(pz != 0, pz, 1.0)
    s = p[..., :2] / pz_safe[..., None]
    rho3d = jnp.sum(s * s, axis=-1)
    d = pre.mean2d[:, None, None, :] - jnp.stack(
        [jnp.broadcast_to(px, (1, H, W)), jnp.broadcast_to(py, (1, H, W))],
        axis=-1,
    )
    rho2d = FILTER_INV_SQUARE * jnp.sum(d * d, axis=-1)
    rho = jnp.minimum(jnp.where(pz != 0, rho3d, jnp.inf), rho2d)
    alpha_raw = jnp.minimum(ALPHA_MAX, opac[:, None, None] * jnp.exp(-0.5 * rho))

    m0 = np.asarray(mask0)
    m1 = np.asarray(mask1)
    um = np.asarray(use_mask)
    rmin = np.asarray(pre.rect_min)
    rmax = np.asarray(pre.rect_max)
    a = np.asarray(alpha_raw)
    n_culled = 0
    for g in range(P):
        if not um[g]:
            continue
        w_g = max(rmax[g, 0] - rmin[g, 0], 1)
        for i in range((rmax[g, 0] - rmin[g, 0]) * (rmax[g, 1] - rmin[g, 1])):
            bit = (m0[g] >> i) & 1 if i < 25 else (m1[g] >> (i - 25)) & 1
            if bit:
                continue
            tx = rmin[g, 0] + i % w_g
            ty = rmin[g, 1] + i // w_g
            blk = a[g, ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16]
            assert blk.size == 0 or float(blk.max()) < ALPHA_MIN, (
                f"gaussian {g} tile ({tx},{ty}) culled but max alpha "
                f"{float(blk.max()):.5f} >= {ALPHA_MIN:.5f}"
            )
            n_culled += 1
    # The scene must actually exercise the cull for the test to mean anything.
    assert n_culled > 200, n_culled
