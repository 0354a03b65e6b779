import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from materialrefgs_tpu.models import gaussian_model as gm


def make_model(P=64, cap=256, rng=None):
    rng = rng or np.random.default_rng(0)
    pts = rng.normal(size=(P, 3)).astype(np.float32)
    cols = rng.uniform(size=(P, 3)).astype(np.float32)
    return gm.create_from_points(pts, cols, capacity=cap)


def test_create_and_activations():
    m = make_model()
    assert int(m.n_alive) == 64
    assert m.params.xyz.shape == (256, 3)
    op = np.asarray(m.get_opacity)
    np.testing.assert_allclose(op[:64], 0.1, atol=1e-5)
    np.testing.assert_allclose(op[64:], 0.0, atol=1e-6)  # dead slots culled
    np.testing.assert_allclose(np.asarray(m.get_refl)[:64], 0.1, atol=1e-5)
    r = np.asarray(m.get_rotation)
    np.testing.assert_allclose(np.linalg.norm(r[:64], axis=-1), 1.0, atol=1e-5)


def test_sh_degree_masking():
    m = make_model()
    f0 = np.asarray(m.get_features())
    assert np.all(f0[:, 1:] == 0)  # degree 0: only DC passes
    m = m.oneup_sh_degree()
    m = m.replace(
        params=m.params.replace(features_rest=jnp.ones_like(m.params.features_rest))
    )
    f1 = np.asarray(m.get_features())
    assert np.all(f1[:, 1:4] == 1.0)  # degree-1 band active
    assert np.all(f1[:, 4:] == 0.0)  # degree-2+ still masked


def test_densification_stats():
    m = make_model()
    g = jnp.ones((256, 2))
    radii = jnp.where(jnp.arange(256) < 32, 5.0, 0.0)
    m = gm.add_densification_stats(m, g, radii)
    acc = np.asarray(m.xyz_gradient_accum)
    np.testing.assert_allclose(acc[:32], np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(acc[32:], 0.0)


def test_densify_clone_and_split():
    m = make_model(P=16, cap=128)
    # Big gradient on everyone; small scales -> clones.
    m = m.replace(
        xyz_gradient_accum=jnp.where(m.alive, 1.0, 0.0),
        denom=jnp.where(m.alive, 1.0, 0.0),
        params=m.params.replace(scaling=jnp.full_like(m.params.scaling, -5.0)),
    )
    params_like = m.params
    opt = optax.adam(1e-3)
    state = opt.init(params_like)
    m2, state2 = gm.densify_and_prune(
        m, state, jax.random.PRNGKey(0), max_grad=0.5, min_opacity=0.005,
        extent=10.0, max_screen_size=None,
    )
    assert int(m2.n_alive) == 32  # every point cloned once
    # Split path: huge scales.
    m3 = m.replace(
        params=m.params.replace(scaling=jnp.full_like(m.params.scaling, 2.0))
    )
    m4, _ = gm.densify_and_prune(
        m3, state, jax.random.PRNGKey(1), max_grad=0.5, min_opacity=0.005,
        extent=10.0, max_screen_size=None,
    )
    # Parents die, 2 children each: 16 -> 32
    assert int(m4.n_alive) == 32
    # children scales shrunk by 1.6
    alive_scales = np.asarray(m4.params.scaling)[np.asarray(m4.alive)]
    np.testing.assert_allclose(alive_scales, 2.0 - np.log(1.6), atol=1e-5)


def test_densify_prunes_low_opacity():
    m = make_model(P=16, cap=64)
    low = jnp.where(
        (jnp.arange(64) < 8)[:, None], -10.0, m.params.opacity
    )
    m = m.replace(params=m.params.replace(opacity=low))
    opt = optax.adam(1e-3)
    state = opt.init(m.params)
    m2, _ = gm.densify_and_prune(
        m, state, jax.random.PRNGKey(0), max_grad=1e9, min_opacity=0.005,
        extent=10.0, max_screen_size=None,
    )
    assert int(m2.n_alive) == 8


def test_zero_adam_rows():
    m = make_model(P=8, cap=32)
    opt = optax.adam(1e-3)
    state = opt.init(m.params)
    grads = jax.tree_util.tree_map(jnp.ones_like, m.params)
    _, state = opt.update(grads, state, m.params)
    mask = jnp.arange(32) < 4
    state2 = gm.zero_adam_rows(state, mask)
    mu = state2[0].mu.xyz
    assert np.all(np.asarray(mu[:4]) == 0)
    assert np.all(np.asarray(mu[4:]) != 0)


def test_resets():
    m = make_model(P=16, cap=32)
    m1 = gm.reset_opacity0(m)
    op = np.asarray(m1.get_opacity)[:16]
    np.testing.assert_allclose(op, 0.01, atol=1e-4)
    m2 = gm.reset_opacity1(m)
    np.testing.assert_allclose(np.asarray(m2.get_opacity)[:16], 0.9, atol=1e-4)
    m3 = gm.reset_refl(m.replace(
        params=m.params.replace(refl_strength=jnp.full_like(m.params.refl_strength, -8.0))
    ))
    np.testing.assert_allclose(np.asarray(m3.get_refl)[:16], 0.1, atol=1e-4)
    m4 = gm.reset_scale(m)
    # init refl=0.1 > thr 0.02 and rough=0.1 <= thr... rough_msk = rough>0.1 False
    # refl_msk = refl < 0.02 False -> msk False -> enlarged by log(1.5)
    np.testing.assert_allclose(
        np.asarray(m4.params.scaling)[:16] - np.asarray(m.params.scaling)[:16],
        np.log(1.5),
        atol=1e-5,
    )
