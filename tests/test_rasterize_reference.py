import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.ops.rasterize.preprocess import compute_transmat, preprocess
from materialrefgs_tpu.ops.rasterize.reference import rasterize_reference


def make_cam(W=48, H=48):
    return look_at_camera(
        eye=np.array([0.0, 0.0, -4.0]),
        target=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]),
        fovx=0.8,
        fovy=0.8,
        width=W,
        height=H,
    )


def random_scene(rng, P=64, spread=1.0):
    means = rng.normal(size=(P, 3)).astype(np.float32) * spread * 0.5
    scales = np.exp(rng.normal(size=(P, 2)).astype(np.float32) * 0.5 - 1.5)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = rng.uniform(size=(P, 4)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats))


def test_transmat_projects_like_camera(rng):
    """Contract: T_rows @ (u,v,1) == (pix_x*w, pix_y*w, w) with w = view z."""
    cam = make_cam()
    P = 16
    means = jnp.asarray(rng.normal(size=(P, 3)) * 0.5, jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(P, 2)) * 0.3 - 1), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(P, 4)), jnp.float32)

    T_rows, tw = compute_transmat(means, scales, rots, cam)

    from materialrefgs_tpu.utils.transforms import quat_to_rotmat

    R = quat_to_rotmat(rots)
    for u, v in [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (0.7, -0.3)]:
        # World point on the splat plane
        pt = (
            means
            + u * R[:, :, 0] * scales[:, 0:1]
            + v * R[:, :, 1] * scales[:, 1:2]
        )
        hom = jnp.concatenate([pt, jnp.ones((P, 1))], axis=-1)
        clip = hom @ cam.full_proj
        w = clip[:, 3]
        pix_x = ((clip[:, 0] / w + 1) * cam.width - 1) / 2
        pix_y = ((clip[:, 1] / w + 1) * cam.height - 1) / 2
        view_z = (hom @ cam.world_view)[:, 2]

        uv1 = jnp.array([u, v, 1.0])
        out = jnp.einsum("pij,j->pi", T_rows, uv1)
        np.testing.assert_allclose(np.asarray(out[:, 2]), np.asarray(view_z), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out[:, 0] / out[:, 2]), np.asarray(pix_x), rtol=1e-3, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out[:, 1] / out[:, 2]), np.asarray(pix_y), rtol=1e-3, atol=1e-3
        )


def test_single_opaque_splat_center_color():
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    scales = jnp.array([[0.5, 0.5]], jnp.float32)
    rots = jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32)
    opac = jnp.array([0.99], jnp.float32)
    colors = jnp.array([[1.0, 0.2, 0.1]], jnp.float32)
    feats = jnp.zeros((1, 4), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    out = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
    cx, cy = cam.width // 2, cam.height // 2
    center_px = np.asarray(out["render"][cy, cx])
    # alpha at dead center = min(0.99, 0.99 * exp(~0)) ~ 0.99
    np.testing.assert_allclose(center_px, 0.99 * np.array([1.0, 0.2, 0.1]), atol=0.02)
    assert np.asarray(out["alpha"][cy, cx]) > 0.95
    # Depth at center ~ distance from camera (4.0)
    assert abs(float(out["depth"][cy, cx]) / float(out["alpha"][cy, cx]) - 4.0) < 0.05
    # Normal points toward camera (-z in view space after dual-visible flip)
    n = np.asarray(out["normal"][cy, cx])
    assert n[2] < -0.9


def test_two_splats_compositing_order():
    """Front red splat at alpha a over back blue: C = a*red + (1-a)*b*blue."""
    cam = make_cam()
    means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]], jnp.float32)  # front, back
    scales = jnp.array([[0.8, 0.8], [0.8, 0.8]], jnp.float32)
    rots = jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]], jnp.float32)
    opac = jnp.array([0.7, 0.9], jnp.float32)
    colors = jnp.array([[1.0, 0, 0], [0, 0, 1.0]], jnp.float32)
    feats = jnp.zeros((2, 4), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    out = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
    cx, cy = cam.width // 2, cam.height // 2
    px = np.asarray(out["render"][cy, cx])
    # At center both alphas ~ their opacity.
    np.testing.assert_allclose(px[0], 0.7, atol=0.02)  # red from front
    np.testing.assert_allclose(px[2], 0.3 * 0.9, atol=0.03)  # blue attenuated
    # Median depth picks the front splat (T drops below 0.5 after it).
    md = float(out["median_depth"][cy, cx])
    assert 2.5 < md < 3.5  # front splat is 3 units from camera


def test_background_compositing():
    cam = make_cam()
    means = jnp.array([[100.0, 100.0, 0.0]], jnp.float32)  # off screen
    scales = jnp.array([[0.1, 0.1]], jnp.float32)
    rots = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
    opac = jnp.array([0.9], jnp.float32)
    colors = jnp.ones((1, 3), jnp.float32)
    feats = jnp.zeros((1, 2), jnp.float32)
    bg = jnp.array([0.3, 0.6, 0.9], jnp.float32)
    out = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.broadcast_to(np.array([0.3, 0.6, 0.9]), out["render"].shape), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out["alpha"]), 0.0, atol=1e-6)


def test_feature_compositing_matches_color(rng):
    """Features with the same values as colors must composite identically."""
    cam = make_cam()
    means, scales, rots, opac, colors, _ = random_scene(rng, P=64)
    feats = jnp.concatenate([colors, colors[:, :1]], axis=-1)
    bg = jnp.zeros(3, jnp.float32)
    out = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
    # feature == render - T*bg (no bg on features)
    np.testing.assert_allclose(
        np.asarray(out["feature"][..., :3]), np.asarray(out["render"]), atol=1e-5
    )


def test_weights_sum_to_alpha(rng):
    cam = make_cam()
    means, scales, rots, opac, colors, feats = random_scene(rng, P=128)
    ones = jnp.ones_like(colors)
    bg = jnp.zeros(3, jnp.float32)
    out = rasterize_reference(means, scales, rots, opac, ones, feats, cam, bg)
    np.testing.assert_allclose(
        np.asarray(out["render"][..., 0]), np.asarray(out["alpha"]), atol=1e-5
    )


def test_grad_flows(rng):
    cam = make_cam(32, 32)
    means, scales, rots, opac, colors, feats = random_scene(rng, P=32)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.zeros((32, 32, 3))

    def loss_fn(means, scales, rots, opac, colors):
        out = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
        return jnp.mean((out["render"] - target) ** 2) + 0.01 * jnp.mean(
            out["distortion"]
        )

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        means, scales, rots, opac, colors
    )
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g))), "non-finite grads"
    # At least the color gradient must be nonzero
    assert float(jnp.abs(grads[4]).sum()) > 0


def test_jit_compiles(rng):
    cam = make_cam(32, 32)
    means, scales, rots, opac, colors, feats = random_scene(rng, P=32)
    bg = jnp.zeros(3, jnp.float32)
    f = jax.jit(
        lambda *a: rasterize_reference(*a, camera=cam, bg_color=bg)["render"]
    )
    out = f(means, scales, rots, opac, colors, feats)
    assert out.shape == (32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))
