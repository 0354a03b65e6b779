"""Camera model (row-vector convention, like the reference).

Conventions (matching reference scene/cameras.py + utils/graphics_utils.py):
  - `world_view` is the *transposed* world-to-view matrix: x_view_row =
    x_world_row @ world_view (reference stores world_view_transform =
    getWorld2View2(R, T).transpose(0, 1), scene/cameras.py:75).
  - `full_proj` = world_view @ projection (both transposed), so clip_row =
    x_world_row @ full_proj; clip.w equals view-space z.
  - R passed in is CAM-TO-WORLD rotation; T is world-to-cam translation
    (COLMAP convention), as in the reference.
  - Pixel centers: ndc2Pix(v, S) = ((v + 1) * S - 1) / 2 (auxiliary.h:63).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

ZNEAR = 0.01
ZFAR = 100.0


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """getWorld2View2 (utils/graphics_utils.py:38): 4x4 W2V (not transposed)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else translate
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """getProjectionMatrix (utils/graphics_utils.py:51), NOT transposed."""
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top, bottom = tan_y * znear, -tan_y * znear
    right, left = tan_x * znear, -tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2 * znear / (right - left)
    P[1, 1] = 2 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def projection_matrix_from_K(
    znear: float, zfar: float, H: int, W: int, K: np.ndarray
) -> np.ndarray:
    """getProjectionMatrixCorrect (utils/graphics_utils.py:74): off-center-aware."""
    top = K[1, 2] / K[1, 1] * znear
    bottom = -(H - K[1, 2]) / K[1, 1] * znear
    right = K[0, 2] / K[0, 0] * znear
    left = -(W - K[0, 2]) / K[0, 0] * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2 * znear / (right - left)
    P[1, 1] = 2 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@struct.dataclass
class Camera:
    """Jittable camera (all matrices in the transposed/row-vector convention)."""

    world_view: jax.Array  # (4,4): x_view_row = x_world_row @ world_view
    full_proj: jax.Array  # (4,4): clip_row = x_world_row @ full_proj
    camera_center: jax.Array  # (3,) world-space camera position
    fx: jax.Array  # focal in pixels
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    fovx: float = struct.field(pytree_node=False, default=0.0)
    fovy: float = struct.field(pytree_node=False, default=0.0)
    znear: float = struct.field(pytree_node=False, default=ZNEAR)
    zfar: float = struct.field(pytree_node=False, default=ZFAR)

    @property
    def tan_fovx(self) -> float:
        return math.tan(self.fovx / 2)

    @property
    def tan_fovy(self) -> float:
        return math.tan(self.fovy / 2)

    def get_K(self, scale: float = 1.0) -> jax.Array:
        return jnp.array(
            [
                [self.fx / scale, 0.0, self.cx / scale],
                [0.0, self.fy / scale, self.cy / scale],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )

    def get_inv_K(self, scale: float = 1.0) -> jax.Array:
        return jnp.array(
            [
                [scale / self.fx, 0.0, -self.cx / self.fx],
                [0.0, scale / self.fy, -self.cy / self.fy],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )

    def get_rays(self, scale: float = 1.0) -> jax.Array:
        """Unnormalized per-pixel camera-space ray directions (H, W, 3), as
        reference scene/cameras.py:96 get_rays (integer pixel coords)."""
        W, H = int(self.width / scale), int(self.height / scale)
        ix = jnp.arange(W, dtype=jnp.float32)[None, :]
        iy = jnp.arange(H, dtype=jnp.float32)[:, None]
        x = (ix - self.cx / scale) / self.fx * scale
        y = (iy - self.cy / scale) / self.fy * scale
        x = jnp.broadcast_to(x, (H, W))
        y = jnp.broadcast_to(y, (H, W))
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    trans: np.ndarray | None = None,
    scale: float = 1.0,
    K: np.ndarray | None = None,
    znear: float = ZNEAR,
    zfar: float = ZFAR,
) -> Camera:
    """Build a Camera from COLMAP-style extrinsics (reference scene/cameras.py:17)."""
    w2v = world_to_view(R, T, trans, scale)
    wvt = w2v.T  # transposed convention
    if K is None:
        proj = projection_matrix(znear, zfar, fovx, fovy).T
        fx, fy = fov2focal(fovx, width), fov2focal(fovy, height)
        cx, cy = 0.5 * width, 0.5 * height
    else:
        proj = projection_matrix_from_K(znear, zfar, height, width, K).T
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    full = wvt @ proj
    cam_center = np.linalg.inv(wvt)[3, :3]
    return Camera(
        world_view=jnp.asarray(wvt, jnp.float32),
        full_proj=jnp.asarray(full, jnp.float32),
        camera_center=jnp.asarray(cam_center, jnp.float32),
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        cx=jnp.float32(cx),
        cy=jnp.float32(cy),
        width=int(width),
        height=int(height),
        fovx=float(fovx),
        fovy=float(fovy),
        znear=float(znear),
        zfar=float(zfar),
    )


def look_at_camera(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
) -> Camera:
    """Convenience constructor for tests/benchmarks: camera at `eye` looking at
    `target` (OpenCV convention: +z forward, +y down)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # R: cam-to-world rotation (columns are camera axes in world space).
    R = np.stack([right, down, fwd], axis=1)
    T = -R.T @ eye  # world-to-cam translation
    return make_camera(R, T, fovx, fovy, width, height)


def make_minicam(
    width: int,
    height: int,
    fovy: float,
    fovx: float,
    world_view: np.ndarray,
    full_proj: np.ndarray,
    znear: float = ZNEAR,
    zfar: float = ZFAR,
) -> Camera:
    """MiniCam (scene/cameras.py:117): camera from raw transform matrices
    (remote-viewer protocol)."""
    cam_center = np.linalg.inv(np.asarray(world_view))[3, :3]
    fx, fy = fov2focal(fovx, width), fov2focal(fovy, height)
    return Camera(
        world_view=jnp.asarray(world_view, jnp.float32),
        full_proj=jnp.asarray(full_proj, jnp.float32),
        camera_center=jnp.asarray(cam_center, jnp.float32),
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        cx=jnp.float32(0.5 * width),
        cy=jnp.float32(0.5 * height),
        width=int(width),
        height=int(height),
        fovx=float(fovx),
        fovy=float(fovy),
        znear=float(znear),
        zfar=float(zfar),
    )


def gen_virtual_cam(
    camera: Camera,
    rng: np.random.Generator,
    trans_noise: float = 1.5,
    deg_noise: float = 30.0,
) -> Camera:
    """Noise-perturbed virtual view (utils/camera_utils.py:126 gen_virtul_cam)."""
    from scipy.spatial.transform import Rotation as SciR

    wv = np.asarray(camera.world_view).T  # W2V (column convention)
    Rw2c = wv[:3, :3]
    t = wv[:3, 3]
    ang = np.deg2rad(rng.uniform(-deg_noise, deg_noise, 3))
    Rn = SciR.from_euler("xyz", ang).as_matrix()
    tn = rng.uniform(-trans_noise, trans_noise, 3) * 0.1
    R_new = Rn @ Rw2c
    t_new = t + tn
    # make_camera takes cam-to-world rotation (transposed storage convention).
    return make_camera(
        R_new.T, t_new, camera.fovx, camera.fovy, camera.width, camera.height
    )
