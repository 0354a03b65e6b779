"""Image-level A/B: bundle splat tracer vs exact per-ray ordering on a
converged-style scene driven by the render_indirect workload shape
(reflected camera rays off a glossy surface) — the VERDICT r1 ask that the
per-bundle mean-axis depth ordering holds up beyond synthetic ray sets."""
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.ops.tracer.api import TracerConfig, trace
from materialrefgs_tpu.ops.tracer.reference import trace_reference
from materialrefgs_tpu.utils import sh as sh_utils
from materialrefgs_tpu.utils.transforms import normalize, reflect

CFG = TracerConfig(
    pair_capacity=1 << 15, cluster_pair_capacity=1 << 11, interpret=True
)


def _shell_scene(rng, P=1024):
    """Bumpy sphere shell of small surfels (the bench.py 'converged object'
    construction, scaled down)."""
    u = rng.normal(size=(P, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    r = 1.0 + 0.05 * rng.standard_normal(P)[:, None]
    means = (u * r).astype(np.float32)
    scales = np.exp(rng.normal(size=(P, 2)) * 0.3 - 2.6).astype(np.float32)
    # Tangent-oriented quats would be ideal; random rotations are the
    # harder case for ordering (more overlap variety).
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.4, 0.95, size=(P,)).astype(np.float32)
    colors = rng.uniform(0.2, 0.8, size=(P, 3)).astype(np.float32)
    shs = np.zeros((P, 16, 3), np.float32)
    shs[:, 0, :] = sh_utils.rgb_to_sh(colors)
    return tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, shs))


def _reflected_rays(rng, side=48):
    """Rays reflected off a virtual glossy plane in front of the shell:
    origins on a grid near z=-2, directions toward the sphere with
    per-pixel normal jitter (what render_indirect produces)."""
    lin = np.linspace(-0.6, 0.6, side, dtype=np.float32)
    gx, gy = np.meshgrid(lin, lin, indexing="xy")
    o = np.stack([gx, gy, np.full_like(gx, -2.2)], -1).reshape(-1, 3)
    view = np.array([0.0, 0.0, 1.0], np.float32)
    n = np.stack(
        [
            0.08 * rng.standard_normal(side * side).astype(np.float32),
            0.08 * rng.standard_normal(side * side).astype(np.float32),
            np.ones(side * side, np.float32),
        ],
        -1,
    )
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = np.asarray(
        reflect(jnp.asarray(-view)[None].repeat(side * side, 0), jnp.asarray(n))
    )
    d = -d  # reflect(w_o, n) returns the bounce of the view ray
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_image_level_ab():
    rng = np.random.default_rng(7)
    means, scales, rots, opac, colors, shs = _shell_scene(rng)
    ro, rd = _reflected_rays(rng)

    ref = trace_reference(ro, rd, means, scales, rots, opac, colors)
    out = trace(ro, rd, means, scales, rots, opac, shs, CFG)
    assert float(out["overflow"]) == 0

    a = np.asarray(out["rgb"])
    b = np.asarray(ref["rgb"])
    hit = np.asarray(ref["acc"]).reshape(-1) > 1e-3
    assert hit.mean() > 0.3, "workload sanity: most rays should hit the shell"

    # Characterization (measured, round 2): on dense curved shells of
    # randomly-tilted splats, the single sorted-list-per-bundle composite
    # reallocates color between locally order-swapped splats vs the exact
    # per-ray hit-t reference: image PSNR ~32.9 dB, per-ray err p50~1.3e-2 /
    # p99~0.12, ~10% of rays >5e-2 — INDEPENDENT of ray divergence and of
    # bundle tightness (same at zero jitter / production 16x16 tile
    # bundles), so it is not the mean-axis approximation but the same
    # approximation class the CUDA 2DGS tile rasterizer itself makes
    # (per-tile center-depth order vs per-pixel order; trained scenes adapt
    # to their renderer's ordering). Opacity accumulation is near-exact
    # (acc err ~4e-7): ordering only re-allocates color. These gates hold
    # the measured line and fail on regression.
    mse = float(np.mean((a - b) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    per_ray = np.abs(a - b).max(axis=-1)
    frac_visible = float(np.mean(per_ray > 5e-2))
    assert psnr > 30.0, (psnr, frac_visible)
    assert frac_visible < 0.15, (psnr, frac_visible)
    assert float(np.percentile(per_ray, 99)) < 0.15

    acc_err = float(np.mean(np.abs(np.asarray(out["acc"]).reshape(-1) - np.asarray(ref["acc"]).reshape(-1))))
    assert acc_err < 1e-3, acc_err


def test_exact_order_matches_reference_single_chunk():
    """With <=128 pairs per bundle (one chunk), exact_order compositing IS
    the exact per-ray order: the tracer must match the exact-order jnp
    reference to float tolerance — no ordering approximation left."""
    rng = np.random.default_rng(3)
    means, scales, rots, opac, colors, shs = _shell_scene(rng, P=96)
    ro, rd = _reflected_rays(rng, side=16)  # 1 bundle of 256 rays
    cfg = TracerConfig(
        pair_capacity=1 << 12, cluster_pair_capacity=1 << 8,
        interpret=True, exact_order=True,
    )
    out = trace(ro, rd, means, scales, rots, opac, colors if False else shs, cfg)
    ref = trace_reference(ro, rd, means, scales, rots, opac, colors)
    assert float(out["overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["acc"]).reshape(-1),
        np.asarray(ref["acc"]).reshape(-1), atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]).reshape(-1),
        np.asarray(ref["depth"]).reshape(-1), atol=5e-4,
    )


def test_exact_order_improves_dense_shell_ab():
    """On the dense tilted shell, exact_order must strictly beat the
    approximate sorted-list compositing vs the exact reference."""
    rng = np.random.default_rng(7)
    means, scales, rots, opac, colors, shs = _shell_scene(rng)
    ro, rd = _reflected_rays(rng)
    ref = trace_reference(ro, rd, means, scales, rots, opac, colors)

    def psnr_of(cfg):
        out = trace(ro, rd, means, scales, rots, opac, shs, cfg)
        a, b = np.asarray(out["rgb"]), np.asarray(ref["rgb"])
        mse = float(np.mean((a - b) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    import dataclasses

    approx = psnr_of(CFG)
    exact = psnr_of(dataclasses.replace(CFG, exact_order=True))
    assert exact > approx + 3.0, (approx, exact)
