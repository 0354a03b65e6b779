"""Camera-path generation (reference utils/video_utils.py extend_cameras +
utils/render_utils.py generate_path)."""
import numpy as np

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.utils.video import (
    generate_ellipse_path,
    interpolate_cameras,
)


def _ring(n=8, r=3.0):
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = np.array([r * np.sin(a), 0.4, -r * np.cos(a)])
        cams.append(look_at_camera(eye, np.zeros(3), np.array([0.0, 1.0, 0.0]),
                                   0.9, 0.9, 32, 32))
    return cams


def test_interpolate_cameras_valid_rotations_and_endpoints():
    cams = _ring(4)
    out = interpolate_cameras(cams, num=4)
    assert len(out) == 3 * 3 + 1
    for c in out:
        R = np.asarray(c.world_view)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-4
    # Last output is the final input camera.
    np.testing.assert_allclose(
        np.asarray(out[-1].camera_center),
        np.asarray(cams[-1].camera_center), atol=1e-5,
    )
    # Interpolated views move off the start camera but stay in the scene
    # scale (reference lerps the W2V translation + nlerps q, so centers
    # swing wider than the chord between ring neighbors).
    d = np.linalg.norm(
        np.asarray(out[1].camera_center) - np.asarray(cams[0].camera_center)
    )
    assert 0.2 < d < 9.0, d


def test_ellipse_path_orbits_and_looks_at_focus():
    cams = _ring(12)
    out = generate_ellipse_path(cams, n_frames=24)
    assert len(out) == 24
    for c in out:
        R = np.asarray(c.world_view)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        center = np.asarray(c.camera_center)
        # Stays near the camera ring (radius ~3).
        assert 1.5 < np.linalg.norm(center[[0, 2]]) < 4.5
        # Optical axis points roughly at the origin (ring focus).
        z = R[:, 2]
        to_origin = -center / np.linalg.norm(center)
        assert float(z @ to_origin) > 0.9
