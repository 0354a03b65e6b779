"""Gradient parity: Pallas custom-VJP backward vs autodiff of the reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from materialrefgs_tpu.ops.rasterize.reference import rasterize_reference

CFG = RasterizeConfig(pair_capacity=1 << 14, interpret=True)


def make_cam(W=32, H=32):
    return look_at_camera(
        eye=np.array([0.0, 0.0, -4.0]),
        target=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]),
        fovx=0.9,
        fovy=0.9,
        width=W,
        height=H,
    )


def random_scene(rng, P=48):
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.6
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.5 - 1.6)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    # Keep opacity < 0.9 so the alpha=min(0.99, .) clamp never activates
    # (the CUDA kernel passes gradients through the clamp; plain autodiff
    # does not, so avoid the clamp region when comparing).
    opac = rng.uniform(0.2, 0.9, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = rng.uniform(size=(P, 4)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats))


def loss_of(out, which):
    weights = {
        "render": 1.0,
        "feature": 0.7,
        "normal": 0.5,
        "depth": 0.3,
        "alpha": 0.4,
        "distortion": 0.2,
        "median_depth": 0.1,
    }
    if which != "all":
        weights = {which: 1.0}
    total = 0.0
    for k, lam in weights.items():
        total = total + lam * jnp.sum(jnp.sin(out[k] * 3.0 + 0.3))
    return total


@pytest.mark.parametrize(
    "which",
    [
        "render",
        pytest.param("distortion", marks=pytest.mark.slow),
        pytest.param("median_depth", marks=pytest.mark.slow),
        "all",
    ],
)
@pytest.mark.core
def test_grad_parity(which):
    rng = np.random.default_rng(7)
    cam = make_cam()
    args = random_scene(rng)
    bg = jnp.array([0.2, 0.4, 0.1], jnp.float32)

    def f_pallas(*a):
        return loss_of(rasterize(*a, camera=cam, bg_color=bg, config=CFG), which)

    def f_ref(*a):
        return loss_of(
            rasterize_reference(*a, camera=cam, bg_color=bg), which
        )

    g_pal = jax.grad(f_pallas, argnums=tuple(range(6)))(*args)
    g_ref = jax.grad(f_ref, argnums=tuple(range(6)))(*args)

    names = ["means", "scales", "rots", "opacity", "colors", "features"]
    for n, gp, gr in zip(names, g_pal, g_ref):
        gp, gr = np.asarray(gp), np.asarray(gr)
        assert np.all(np.isfinite(gp)), f"{which}/{n} non-finite"
        # Absolute floor 1e-4: gradients that are analytically ~0 (e.g.
        # median depth wrt in-plane scales) are cancellation noise in both
        # implementations and may disagree at the 1e-5 level.
        scale = np.maximum(np.abs(gr).max(), 1e-3)
        np.testing.assert_allclose(
            gp, gr, atol=2e-3 * scale + 1e-4, err_msg=f"{which}: grad {n}"
        )


def test_mean2d_offset_full_screen_shift_grad():
    """The densification probe must capture screen-translation gradients for
    BOTH per-pixel branches (ray-splat 3D and low-pass 2D) — reference
    viewspace_point_tensor semantics (train_refnerf.py:1414-1418). Validated
    against finite differences of an actual screen shift."""
    rng = np.random.default_rng(3)
    cam = make_cam()
    P = 24
    means = rng.normal(size=(P, 3)).astype(np.float32) * 0.5
    # Big splats: the 3D ray-splat branch dominates (rho3d < rho2d).
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.3 + 0.2)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.8, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = rng.uniform(size=(P, 2)).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats))

    def f(off):
        out = rasterize(
            *args, camera=cam, bg_color=jnp.zeros(3), config=CFG,
            mean2d_offset=off,
        )
        return jnp.sum(jnp.sin(out["render"] * 2.0))

    zero = jnp.zeros((P, 2), jnp.float32)
    g = np.asarray(jax.grad(f)(zero))
    assert np.all(np.isfinite(g))
    # At least one visible big splat must carry a nonzero screen grad.
    assert np.abs(g).max() > 1e-5

    # Finite-difference check on the largest-grad entry. eps must be large
    # enough that the secant signal (~2*eps*|g|) clears f32 rounding of the
    # summed loss (~2400, ulp 2.4e-4); 3e-2 px gives ~0.3 signal vs 5e-4
    # noise at ~2% curvature error.
    i, j = np.unravel_index(np.abs(g).argmax(), g.shape)
    eps = 3e-2
    e = zero.at[i, j].set(eps)
    fd = (float(f(e)) - float(f(-e))) / (2 * eps)
    np.testing.assert_allclose(g[i, j], fd, rtol=7e-2, atol=1e-5)


def test_multichunk_forward_and_grad_parity(rng):
    """>K_CHUNK(128) pairs per tile: exercises the cross-chunk logT carry,
    DMA slot parity, backward carry_gw/carry_lg suffix chain, and the
    zero_body/drain paths that single-chunk scenes (every other test) never
    reach. 400 low-opacity splats piled on the image center give ~400 pairs
    in each central tile with no early exit before lane 128."""
    cam = make_cam(32, 32)
    P = 400
    means = (rng.normal(size=(P, 3)) * 0.05).astype(np.float32)
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.3 - 1.2)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    # alpha ~0.02: T after 400 composites ~ 0.98^400 ~ 3e-4 > 1e-4 stop.
    opac = rng.uniform(0.015, 0.03, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = rng.uniform(size=(P, 4)).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats))

    out = rasterize(*args, camera=cam, bg_color=jnp.zeros(3), config=CFG)
    ref = rasterize_reference(*args, camera=cam, bg_color=jnp.zeros(3))
    assert int(out["overflow"]) == 0
    # Workload sanity: the center tiles really do need multiple chunks.
    assert int(jnp.max(out["n_contrib"])) > 128, int(jnp.max(out["n_contrib"]))
    for k in ["render", "feature", "depth", "normal", "alpha", "distortion"]:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), atol=3e-4, rtol=1e-3,
            err_msg=k,
        )

    def loss_fn(fn):
        def f(*a):
            o = fn(*a, camera=cam, bg_color=jnp.zeros(3), **(
                {"config": CFG} if fn is rasterize else {}
            ))
            return (
                jnp.mean((o["render"] - 0.4) ** 2)
                + 0.05 * jnp.mean(o["feature"])
                + 0.01 * jnp.mean(o["depth"])
                + 0.01 * jnp.mean(o["distortion"])
            )
        return f

    g1 = jax.grad(loss_fn(rasterize), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g2 = jax.grad(loss_fn(rasterize_reference), argnums=(0, 1, 2, 3, 4, 5))(*args)
    for n, a, b in zip(["means", "scales", "rots", "opac", "colors", "feats"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), n
        s = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=4e-3 * s + 1e-5, err_msg=n)
