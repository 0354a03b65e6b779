import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.config import OptimizationParams
from materialrefgs_tpu.train import warp


def plane_depth(camera, z0=2.0):
    """Depth map of the world plane z == z0 seen from `camera`."""
    rays = camera.get_rays()  # camera-space dirs, z=1
    R = camera.world_view[:3, :3]
    d_world = jnp.einsum("hwc,cd->hwd", rays, R.T)
    o = camera.camera_center
    t = (z0 - o[2]) / d_world[..., 2]
    return t  # depth along the z=1-normalized camera ray == view z


def make_two_cams(W=48, H=48):
    c1 = look_at_camera(
        np.array([0.0, 0.0, -3.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.8, 0.8, W, H,
    )
    c2 = look_at_camera(
        np.array([0.6, 0.1, -2.9]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.8, 0.8, W, H,
    )
    return c1, c2


def test_grid_sample_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(8, 10, 3)), jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(8.0), jnp.arange(10.0), indexing="ij")
    coords = jnp.stack(
        [2 * xs / 9 - 1, 2 * ys / 7 - 1], axis=-1
    ).reshape(-1, 2)
    out = warp.grid_sample(img, coords).reshape(8, 10, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_points_from_depth_reprojection_consistency():
    """Consistent plane depths in two views -> zero reprojection noise."""
    c1, c2 = make_two_cams()
    d1 = plane_depth(c1)
    d2 = plane_depth(c2)

    pts = warp.points_from_depth(c1, d1)
    # All points must lie on z = 2 world plane.
    np.testing.assert_allclose(np.asarray(pts[:, 2]), 2.0, atol=1e-4)

    pts_near = pts @ c2.world_view[:3, :3] + c2.world_view[3, :3]
    map_z, mask = warp.points_depth_in_depth_map(c2, d2, pts_near)
    # Where strictly interior, the sampled depth equals the point's view-z.
    # Border projections blend zero-padded taps (torch F.grid_sample
    # semantics, matching the reference) and are filtered downstream by
    # the pixel-noise threshold, so exclude them here.
    W2, H2 = c2.width, c2.height
    px = np.asarray(pts_near[:, 0] * c2.fx / pts_near[:, 2] + c2.cx)
    py = np.asarray(pts_near[:, 1] * c2.fy / pts_near[:, 2] + c2.cy)
    interior = np.asarray(mask) & (px > 1) & (px < W2 - 2) & (py > 1) & (py < H2 - 2)
    err = np.abs(np.asarray(map_z - pts_near[:, 2]))[interior]
    assert err.max() < 5e-2


def test_calc_warp_loss_consistent_geometry():
    c1, c2 = make_two_cams()
    H, W = c1.height, c1.width
    d1, d2 = plane_depth(c1), plane_depth(c2)
    n_world = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (H, W, 3))

    def pkg(cam, depth):
        rays = cam.get_rays()
        nv = n_world.reshape(-1, 3) @ cam.world_view[:3, :3]
        dist = jnp.abs(
            jnp.sum(nv.reshape(H, W, 3) * (rays * depth[..., None]), axis=-1)
        )
        flat = jnp.zeros((H, W, 3))
        return {
            "surf_depth": depth,
            "rend_normal": n_world,
            "rend_distance": dist[..., None],
            "diffuse_map": flat + 0.5,
            "refl_strength_map": jnp.zeros((H, W, 1)),
            "roughness_map": jnp.zeros((H, W, 1)),
        }

    opt = OptimizationParams(multi_view_sample_num=512)
    gray = jnp.full((H, W), 0.5)
    mask = jnp.ones((H, W))
    out = warp.calc_warp_loss(
        c1, c2, pkg(c1, d1), pkg(c2, d2), gray, gray, mask, opt,
        jnp.float32(20000), jax.random.PRNGKey(0), use_ncc=True,
    )
    # Perfectly consistent geometry and constant colors: tiny losses.
    assert float(out.geo_loss) < 1e-3
    # Border-straddling patches blend zero-padded taps asymmetrically in
    # the two views (torch grid_sample semantics) — a small nonzero floor
    # the reference also produces; interior consistency keeps it tiny.
    assert float(out.base_color_loss) < 5e-3
    assert float(out.metallic_warp_loss) < 1e-5
    assert np.isfinite(float(out.ncc_loss))
    # Weights nonzero somewhere (overlapping region).
    assert float(out.weights_map.max()) > 0.5


def test_mono_normal_loss_perfect_prior():
    c1, _ = make_two_cams()
    H, W = c1.height, c1.width
    n_world = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (H, W, 3))
    prior_cam = n_world.reshape(-1, 3) @ c1.world_view[:3, :3]
    prior_cam = prior_cam.reshape(H, W, 3)
    l1s, coss, l1r, cosr = warp.mono_normal_loss(
        c1, n_world, n_world, prior_cam, jnp.ones((H, W))
    )
    assert float(l1s) < 1e-5 and float(coss) < 1e-6
    assert float(l1r) < 1e-5 and float(cosr) < 1e-6


def test_warp_gradient_contract_matches_reference():
    """Gradient-flow parity with the reference's no_grad structure
    (train_refnerf.py:512-541 + grid.detach()): the base-color warp must
    have ZERO gradient into the CURRENT view's diffuse map and a nonzero
    gradient into the NEAREST view's; with use_warp_geo_loss=False (the
    refnerf/glossy reality — calc_warp_loss returns None for geo/ncc,
    train_refnerf.py:745) the geo term is exactly zero."""
    import dataclasses as _dc

    c1, c2 = make_two_cams()
    H, W = c1.height, c1.width
    d1, d2 = plane_depth(c1), plane_depth(c2)
    n_world = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (H, W, 3))

    def pkg(cam, depth, diffuse):
        rays = cam.get_rays()
        nv = n_world.reshape(-1, 3) @ cam.world_view[:3, :3]
        dist = jnp.abs(
            jnp.sum(nv.reshape(H, W, 3) * (rays * depth[..., None]), axis=-1)
        )
        return {
            "surf_depth": depth,
            "rend_normal": n_world,
            "rend_distance": dist[..., None],
            "diffuse_map": diffuse,
            "refl_strength_map": jnp.zeros((H, W, 1)),
            "roughness_map": jnp.zeros((H, W, 1)),
        }

    opt = OptimizationParams(multi_view_sample_num=256)
    assert not opt.use_warp_geo_loss and not opt.use_warp_ncc_loss
    gray = jnp.full((H, W), 0.5)
    mask = jnp.ones((H, W))
    key = jax.random.PRNGKey(1)

    def bc_loss(ref_diffuse, nst_diffuse):
        out = warp.calc_warp_loss(
            c1, c2, pkg(c1, d1, ref_diffuse), pkg(c2, d2, nst_diffuse),
            gray, gray, mask, opt, jnp.float32(20000), key, use_ncc=False,
        )
        return out.base_color_loss + out.geo_loss, out

    ref_d = jnp.full((H, W, 3), 0.3)
    nst_d = jnp.full((H, W, 3), 0.7)
    (g_ref, g_nst), out = jax.grad(
        bc_loss, argnums=(0, 1), has_aux=True
    )(ref_d, nst_d)
    assert float(out.geo_loss) == 0.0
    assert float(out.base_color_loss) > 1e-4  # maps differ -> active loss
    assert float(jnp.max(jnp.abs(g_ref))) == 0.0, "grad leaked into ref view"
    assert float(jnp.max(jnp.abs(g_nst))) > 0.0, "nearest view got no grad"


def test_ncc_reflectivity_gate_skips_reflective_pixels():
    """get_consistency_loss2 (train_refreal.py:358-396): pixels whose mean
    two-view metallic >= 0.2 are excluded from the NCC mask."""
    import dataclasses as _dc

    c1, c2 = make_two_cams()
    H, W = c1.height, c1.width
    d1, d2 = plane_depth(c1), plane_depth(c2)
    n_world = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (H, W, 3))

    def pkg(cam, depth, refl):
        rays = cam.get_rays()
        nv = n_world.reshape(-1, 3) @ cam.world_view[:3, :3]
        dist = jnp.abs(
            jnp.sum(nv.reshape(H, W, 3) * (rays * depth[..., None]), axis=-1)
        )
        return {
            "surf_depth": depth,
            "rend_normal": n_world,
            "rend_distance": dist[..., None],
            "diffuse_map": jnp.full((H, W, 3), 0.5),
            "refl_strength_map": jnp.full((H, W, 1), refl),
            "roughness_map": jnp.zeros((H, W, 1)),
        }

    opt = OptimizationParams(
        multi_view_sample_num=256, use_warp_ncc_loss=True,
        use_warp_geo_loss=True,
    )
    # DIFFERENT grays => nonzero NCC wherever the mask admits pixels.
    g1 = jnp.linspace(0, 1, H * W).reshape(H, W)
    g2 = g1.T
    mask = jnp.ones((H, W))
    key = jax.random.PRNGKey(2)

    out_matte = warp.calc_warp_loss(
        c1, c2, pkg(c1, d1, 0.0), pkg(c2, d2, 0.0), g1, g2, mask, opt,
        jnp.float32(20000), key, use_ncc=True,
    )
    out_mirror = warp.calc_warp_loss(
        c1, c2, pkg(c1, d1, 0.9), pkg(c2, d2, 0.9), g1, g2, mask, opt,
        jnp.float32(20000), key, use_ncc=True,
    )
    assert float(out_matte.ncc_loss) > 1e-4
    assert float(out_mirror.ncc_loss) == 0.0, "reflective pixels not gated"
