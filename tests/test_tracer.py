"""Splat tracer: Pallas bundle tracer vs exact-order jnp reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.ops.tracer.api import TracerConfig, trace
from materialrefgs_tpu.ops.tracer.reference import trace_reference
from materialrefgs_tpu.utils import sh as sh_utils

CFG = TracerConfig(
    pair_capacity=1 << 13, cluster_pair_capacity=1 << 10, interpret=True
)


def make_scene(rng, P=64, spread=2.0):
    means = rng.uniform(-spread, spread, size=(P, 3)).astype(np.float32)
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.3 - 2.2)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(P,)).astype(np.float32)
    colors = rng.uniform(0.2, 0.8, size=(P, 3)).astype(np.float32)
    # Degree-0 SH so pallas (bundle-dir SH) == reference (fixed colors).
    shs = np.zeros((P, 16, 3), np.float32)
    shs[:, 0, :] = sh_utils.rgb_to_sh(colors)
    return tuple(
        jnp.asarray(a) for a in (means, scales, rots, opac, colors, shs)
    )


def make_rays(rng, n_bundles=2):
    """Coherent bundles: parallel-ish rays from a plane."""
    N = n_bundles * 256
    o = np.zeros((N, 3), np.float32)
    o[:, 0] = rng.uniform(-0.3, 0.3, N)
    o[:, 1] = rng.uniform(-0.3, 0.3, N)
    o[:, 2] = -6.0
    d = np.zeros((N, 3), np.float32)
    d[:, 0] = rng.uniform(-0.05, 0.05, N)
    d[:, 1] = rng.uniform(-0.05, 0.05, N)
    d[:, 2] = 1.0
    # Second bundle points slightly differently.
    for b in range(n_bundles):
        d[b * 256 : (b + 1) * 256, 0] += 0.15 * b
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.core
def test_tracer_matches_reference():
    rng = np.random.default_rng(0)
    means, scales, rots, opac, colors, shs = make_scene(rng)
    ro, rd = make_rays(rng)

    ref = trace_reference(ro, rd, means, scales, rots, opac, colors)
    out = trace(ro, rd, means, scales, rots, opac, shs, CFG)

    assert float(out["overflow"]) == 0
    for k, tol in [("rgb", 2e-3), ("acc", 2e-3), ("depth", 2e-2), ("normal", 2e-3)]:
        a = np.asarray(out[k])
        b = np.asarray(ref[k])
        # Ordering approximations may differ on a tiny fraction of rays where
        # overlapping splats swap; require near-exact on 99%+ of rays.
        err = np.abs(a - b).reshape(a.shape[0], -1).max(axis=-1)
        frac_bad = float(np.mean(err > tol))
        assert frac_bad < 0.02, (k, frac_bad, err.max())


def test_tracer_miss_gives_zero():
    rng = np.random.default_rng(1)
    means, scales, rots, opac, colors, shs = make_scene(rng)
    ro = jnp.full((256, 3), 100.0)  # far away from everything
    rd = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (256, 1))
    out = trace(ro, rd, means, scales, rots, opac, shs, CFG)
    np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.0, atol=1e-6)


def test_tracer_gradients():
    rng = np.random.default_rng(2)
    means, scales, rots, opac, colors, shs = make_scene(rng, P=32)
    ro, rd = make_rays(rng, n_bundles=1)

    def f_pallas(means, opac, shs, ro, rd):
        out = trace(ro, rd, means, scales, rots, opac, shs, CFG)
        return (
            jnp.sum(out["rgb"] * 1.3)
            + jnp.sum(out["depth"]) * 0.1
            + jnp.sum(out["normal"] * 0.3)
            + jnp.sum(out["acc"]) * 0.5
        )

    def f_ref(means, opac, colors, ro, rd):
        out = trace_reference(ro, rd, means, scales, rots, opac, colors)
        return (
            jnp.sum(out["rgb"] * 1.3)
            + jnp.sum(out["depth"]) * 0.1
            + jnp.sum(out["normal"] * 0.3)
            + jnp.sum(out["acc"]) * 0.5
        )

    gp = jax.grad(f_pallas, argnums=(0, 1, 3, 4))(means, opac, shs, ro, rd)
    gr = jax.grad(f_ref, argnums=(0, 1, 3, 4))(means, opac, colors, ro, rd)
    names = ["means", "opacity", "rays_o", "rays_d"]
    for n, a, b in zip(names, gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), n
        scale = max(np.abs(b).max(), 1e-3)
        frac_bad = np.mean(np.abs(a - b) > 5e-3 * scale + 1e-4)
        assert frac_bad < 0.02, (n, frac_bad, np.abs(a - b).max(), scale)


def make_scene_sh(rng, P=32, spread=2.0, sh_degree=3):
    """Scene with NONZERO higher SH bands — exercises per-ray color."""
    means = rng.uniform(-spread, spread, size=(P, 3)).astype(np.float32)
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.3 - 2.2)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, size=(P,)).astype(np.float32)
    n_sh = (sh_degree + 1) ** 2
    shs = np.zeros((P, 16, 3), np.float32)
    shs[:, 0, :] = sh_utils.rgb_to_sh(
        rng.uniform(0.3, 0.7, size=(P, 3)).astype(np.float32)
    )
    # Small higher bands keep colors mostly unclamped (smooth grads).
    shs[:, 1:n_sh, :] = 0.15 * rng.standard_normal((P, n_sh - 1, 3)).astype(
        np.float32
    )
    return tuple(jnp.asarray(a) for a in (means, scales, rots, opac, shs))


def test_tracer_per_ray_sh_forward():
    """Per-ray SH color (deg 3, nonzero bands): tracer vs per-ray reference.

    Rays within a bundle point in DIFFERENT directions, so a bundle-mean SH
    eval would be visibly wrong; the in-kernel per-ray eval must match."""
    rng = np.random.default_rng(11)
    means, scales, rots, opac, shs = make_scene_sh(rng, P=64)
    ro, rd = make_rays(rng)
    ref = trace_reference(
        ro, rd, means, scales, rots, opac, None, shs=shs, sh_degree=3
    )
    for exact in (False, True):
        import dataclasses

        out = trace(
            ro, rd, means, scales, rots, opac, shs,
            dataclasses.replace(CFG, exact_order=exact),
        )
        assert float(out["overflow"]) == 0
        a = np.asarray(out["rgb"])
        b = np.asarray(ref["rgb"])
        err = np.abs(a - b).max(axis=-1)
        frac_bad = float(np.mean(err > 2e-3))
        assert frac_bad < 0.02, (exact, frac_bad, err.max())


def _loss_terms(out):
    return (
        jnp.sum(out["rgb"] * 1.3)
        + jnp.sum(out["depth"]) * 0.1
        + jnp.sum(out["normal"] * 0.3)
        + jnp.sum(out["acc"]) * 0.5
    )


@pytest.mark.core
def test_tracer_exact_order_gradients():
    """VERDICT r2 item 2: exact_order training gradients vs trace_reference
    autodiff — per-ray compositing order AND per-ray SH color, including
    ray-direction gradients through the SH basis."""
    import dataclasses

    rng = np.random.default_rng(13)
    means, scales, rots, opac, shs = make_scene_sh(rng, P=32)
    ro, rd = make_rays(rng, n_bundles=1)
    cfg = dataclasses.replace(CFG, exact_order=True)

    def f_pallas(means, opac, shs, ro, rd):
        return _loss_terms(trace(ro, rd, means, scales, rots, opac, shs, cfg))

    def f_ref(means, opac, shs, ro, rd):
        return _loss_terms(
            trace_reference(
                ro, rd, means, scales, rots, opac, None, shs=shs, sh_degree=3
            )
        )

    gp = jax.grad(f_pallas, argnums=(0, 1, 2, 3, 4))(means, opac, shs, ro, rd)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(means, opac, shs, ro, rd)
    names = ["means", "opacity", "shs", "rays_o", "rays_d"]
    for n, a, b in zip(names, gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), n
        scale = max(np.abs(b).max(), 1e-3)
        frac_bad = np.mean(np.abs(a - b) > 5e-3 * scale + 1e-4)
        assert frac_bad < 0.02, (n, frac_bad, np.abs(a - b).max(), scale)


def test_tracer_exact_order_gradients_multichunk():
    """Exact-order backward across MULTIPLE chunks (suffix carries + T-stop
    reconstruction from the saved total log-T): a dense many-splat scene so
    per-bundle pair lists span several 128-pair chunks and rays saturate
    (exercises the inclusion-mask re-derivation)."""
    import dataclasses

    rng = np.random.default_rng(17)
    means, scales, rots, opac, shs = make_scene_sh(rng, P=512, spread=1.2)
    opac = jnp.asarray(
        rng.uniform(0.6, 0.95, size=(512,)).astype(np.float32)
    )
    ro, rd = make_rays(rng, n_bundles=1)
    cfg = dataclasses.replace(CFG, exact_order=True)

    def f_pallas(means, opac, shs):
        return _loss_terms(trace(ro, rd, means, scales, rots, opac, shs, cfg))

    def f_ref(means, opac, shs):
        return _loss_terms(
            trace_reference(
                ro, rd, means, scales, rots, opac, None, shs=shs, sh_degree=3
            )
        )

    out = trace(ro, rd, means, scales, rots, opac, shs, cfg)
    assert float(out["overflow"]) == 0
    # Workload sanity: multiple chunks and saturated rays.
    assert float(jnp.min(out["final_T"])) < 1e-3

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(means, opac, shs)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(means, opac, shs)
    for n, a, b in zip(["means", "opacity", "shs"], gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), n
        scale = max(np.abs(b).max(), 1e-3)
        # Cross-chunk interleaving is center-depth ordered, so a small
        # fraction of order-swapped splats may differ from the global
        # exact order.
        frac_bad = np.mean(np.abs(a - b) > 1e-2 * scale + 1e-4)
        assert frac_bad < 0.05, (n, frac_bad, np.abs(a - b).max(), scale)


@pytest.mark.core
def test_dead_capacity_padding_does_not_flood_cluster_budget(rng):
    """Dead clusters (capacity >> alive: centers collapse to the origin,
    radius 0) must NOT pass the stage-1 cone cull: rays aimed at the origin
    would otherwise pair with every dead cluster, displacing real clusters
    from the fixed nonzero list and megainflating the overflow counter
    (round-3 flagship regression: 26M reported overflow at surfel2 onset)."""
    means, scales, rots, opac, colors, shs = make_scene(rng, P=64)
    CAP = 8192  # 32 clusters; only the first holds alive gaussians
    pad = CAP - 64
    means_p = jnp.concatenate([means, jnp.zeros((pad, 3))])
    scales_p = jnp.concatenate([scales, jnp.full((pad, 2), 1e-3)])
    rots_p = jnp.concatenate([rots, jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (pad, 1))])
    opac_p = jnp.concatenate([opac, jnp.zeros(pad)])  # dead: below 1/255
    shs_p = jnp.concatenate([shs, jnp.zeros((pad, 16, 3))])

    o, d = make_rays(rng)  # aimed straight at the origin region
    # A cluster budget that fits the ALIVE clusters with room to spare but
    # would overflow instantly if the 31 dead clusters paired with both
    # bundles.
    cfg = TracerConfig(
        pair_capacity=1 << 13, cluster_pair_capacity=8, interpret=True
    )
    out = trace(o, d, means_p, scales_p, rots_p, opac_p, shs_p, cfg)
    assert int(out["overflow"]) == 0, int(out["overflow"])
    # And the render matches the unpadded scene exactly.
    ref = trace(o, d, means, scales, rots, opac, shs, CFG)
    np.testing.assert_allclose(
        np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=1e-5
    )


@pytest.mark.core
def test_tracer_bundle_mask():
    """Masked bundles return zero output (final_T=1) and do not perturb the
    active bundles' results (they only cull stage-1 pairs for themselves)."""
    rng = np.random.default_rng(7)
    means, scales, rots, opac, colors, shs = make_scene(rng)
    ro, rd = make_rays(rng, n_bundles=4)

    full = trace(ro, rd, means, scales, rots, opac, shs, CFG)
    mask = jnp.asarray([True, False, True, False])
    part = trace(ro, rd, means, scales, rots, opac, shs, CFG, bundle_mask=mask)

    for k in ("rgb", "acc", "depth", "normal", "final_T"):
        a = np.asarray(full[k]).reshape(4, 256, -1)
        b = np.asarray(part[k]).reshape(4, 256, -1)
        np.testing.assert_allclose(b[0], a[0], atol=1e-6, err_msg=k)
        np.testing.assert_allclose(b[2], a[2], atol=1e-6, err_msg=k)
    for k, fill in [("rgb", 0.0), ("acc", 0.0), ("depth", 0.0),
                    ("normal", 0.0), ("final_T", 1.0)]:
        b = np.asarray(part[k]).reshape(4, 256, -1)
        np.testing.assert_allclose(b[1], fill, atol=0, err_msg=k)
        np.testing.assert_allclose(b[3], fill, atol=0, err_msg=k)

    # Gradients only flow to/through active bundles.
    def loss_fn(rd_in):
        out = trace(ro, rd_in, means, scales, rots, opac, shs, CFG,
                    bundle_mask=mask)
        return jnp.sum(out["rgb"] ** 2)

    g = jax.grad(loss_fn)(rd)
    g = np.asarray(g).reshape(4, 256, 3)
    assert np.all(g[1] == 0) and np.all(g[3] == 0)
    assert np.any(g[0] != 0) or np.any(g[2] != 0)
