"""Dataset readers (reference scene/dataset_readers.py): Blender + COLMAP.

Returns SceneInfo with CameraInfo lists; images are loaded lazily as float32
(H, W, 3) channel-last arrays.
"""
from __future__ import annotations

import json
import math
import os
from pathlib import Path
from typing import NamedTuple

import numpy as np
from PIL import Image as PILImage

from materialrefgs_tpu.cameras import focal2fov, fov2focal, world_to_view
from materialrefgs_tpu.data import colmap_loader as cl
from materialrefgs_tpu.utils.ply import read_point_cloud_ply, write_point_cloud_ply


class BasicPointCloud(NamedTuple):
    points: np.ndarray
    colors: np.ndarray
    normals: np.ndarray


class CameraInfo(NamedTuple):
    uid: int
    R: np.ndarray  # cam-to-world rotation (stored transposed like reference)
    T: np.ndarray  # world-to-cam translation
    K: np.ndarray | None
    FovY: float
    FovX: float
    image_path: str
    image_name: str
    width: int
    height: int
    white_background: bool = False


class SceneInfo(NamedTuple):
    point_cloud: BasicPointCloud
    train_cameras: list
    test_cameras: list
    nerf_normalization: dict
    ply_path: str


def load_image(info: CameraInfo, resolution_scale: int = 1) -> np.ndarray:
    """(H, W, 3) float32 in [0,1]; alpha composited over bg for RGBA."""
    img = PILImage.open(info.image_path)
    if resolution_scale != 1:
        img = img.resize(
            (info.width // resolution_scale, info.height // resolution_scale),
            PILImage.LANCZOS,
        )
    arr = np.asarray(img.convert("RGBA"), np.float32) / 255.0
    bg = 1.0 if info.white_background else 0.0
    return arr[..., :3] * arr[..., 3:4] + bg * (1 - arr[..., 3:4])


def get_nerfpp_norm(cam_infos) -> dict:
    centers = []
    for cam in cam_infos:
        W2C = world_to_view(cam.R, cam.T)
        centers.append(np.linalg.inv(W2C)[:3, 3])
    centers = np.stack(centers)
    center = centers.mean(axis=0)
    diagonal = np.max(np.linalg.norm(centers - center, axis=-1))
    return {"translate": -center, "radius": diagonal * 1.1}


def read_blender_scene(
    path: str, white_background: bool, eval_split: bool, extension: str = ".png"
) -> SceneInfo:
    """readNerfSyntheticInfo (dataset_readers.py:249-330)."""

    def read_transforms(fname):
        infos = []
        with open(os.path.join(path, fname)) as f:
            contents = json.load(f)
        fovx = contents["camera_angle_x"]
        for idx, frame in enumerate(contents["frames"]):
            cam_name = os.path.join(path, frame["file_path"] + extension)
            c2w = np.array(frame["transform_matrix"])
            c2w[:3, 1:3] *= -1  # OpenGL/Blender -> COLMAP axes
            w2c = np.linalg.inv(c2w)
            R = np.transpose(w2c[:3, :3])
            T = w2c[:3, 3]
            with PILImage.open(cam_name) as im:
                W, H = im.size
            fovy = focal2fov(fov2focal(fovx, W), H)
            infos.append(
                CameraInfo(
                    uid=idx, R=R, T=T, K=None, FovY=fovy, FovX=fovx,
                    image_path=cam_name, image_name=Path(cam_name).stem,
                    width=W, height=H, white_background=white_background,
                )
            )
        return infos

    train = read_transforms("transforms_train.json")
    test_file = os.path.join(path, "transforms_test.json")
    test = read_transforms("transforms_test.json") if os.path.exists(test_file) else []
    if not eval_split:
        train = train + test
        test = []

    norm = get_nerfpp_norm(train)
    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        rng = np.random.default_rng(0)
        num_pts = 100_000
        xyz = rng.random((num_pts, 3)) * 2.6 - 1.3
        shs = rng.random((num_pts, 3)) / 255.0
        colors = shs * 0.28209479177387814 + 0.5
        try:
            write_point_cloud_ply(ply_path, xyz, colors)
        except OSError:
            pass
        pcd = BasicPointCloud(xyz.astype(np.float32), colors.astype(np.float32), np.zeros_like(xyz, dtype=np.float32))
    else:
        pts, cols, nrm = read_point_cloud_ply(ply_path)
        pcd = BasicPointCloud(pts, cols, nrm)
    return SceneInfo(pcd, train, test, norm, ply_path)


def read_colmap_scene(
    path: str, images_dir: str = "images", eval_split: bool = False, llffhold: int = 8
) -> SceneInfo:
    """readColmapSceneInfo (dataset_readers.py:199-247)."""
    sparse = os.path.join(path, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    try:
        # Native fast path for images.bin (the largest COLMAP file; the
        # pure-Python struct loop is O(seconds) on big models).
        from materialrefgs_tpu.data import native_io

        extr = None
        img_bin = os.path.join(sparse, "images.bin")
        if os.path.exists(img_bin):
            fast = native_io.read_images(img_bin)
            if fast is not None:
                qvec, tvec, camid, names = fast
                extr = {
                    i: cl.Image(
                        id=i,
                        qvec=qvec[i],
                        tvec=tvec[i],
                        camera_id=int(camid[i]),
                        name=names[i],
                        xys=np.zeros((0, 2)),
                        point3D_ids=np.zeros(0, np.int64),
                    )
                    for i in range(len(names))
                }
        if extr is None:
            extr = cl.read_extrinsics_binary(img_bin)
        intr = cl.read_intrinsics_binary(os.path.join(sparse, "cameras.bin"))
    except FileNotFoundError:
        extr = cl.read_extrinsics_text(os.path.join(sparse, "images.txt"))
        intr = cl.read_intrinsics_text(os.path.join(sparse, "cameras.txt"))

    infos = []
    for idx, key in enumerate(sorted(extr.keys(), key=lambda k: extr[k].name)):
        ext = extr[key]
        cam = intr[ext.camera_id]
        R = np.transpose(cl.qvec2rotmat(ext.qvec))
        T = np.array(ext.tvec)
        H, W = cam.height, cam.width
        if cam.model == "SIMPLE_PINHOLE":
            f, cx, cy = cam.params[:3]
            K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]])
            fovx = focal2fov(f, W)
            fovy = focal2fov(f, H)
        elif cam.model == "PINHOLE":
            fx, fy, cx, cy = cam.params[:4]
            K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
            fovx = focal2fov(fx, W)
            fovy = focal2fov(fy, H)
        else:
            raise ValueError(
                f"Unsupported COLMAP camera model {cam.model}; undistort first."
            )
        img_path = os.path.join(path, images_dir, ext.name)
        infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, K=K, FovY=fovy, FovX=fovx,
                image_path=img_path, image_name=Path(ext.name).stem,
                width=W, height=H,
            )
        )

    if eval_split:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, []

    norm = get_nerfpp_norm(train)
    ply_path = os.path.join(sparse, "points3D.ply")
    bin_path = os.path.join(sparse, "points3D.bin")
    txt_path = os.path.join(sparse, "points3D.txt")
    if not os.path.exists(ply_path):
        if os.path.exists(bin_path):
            from materialrefgs_tpu.data import native_io

            fast = native_io.read_points3d(bin_path)
            if fast is not None:
                xyz, rgb, _ = fast
            else:
                xyz, rgb, _ = cl.read_points3D_binary(bin_path)
        else:
            xyz, rgb, _ = cl.read_points3D_text(txt_path)
        try:
            write_point_cloud_ply(ply_path, xyz, rgb / 255.0)
        except OSError:
            pass
        pcd = BasicPointCloud(
            xyz.astype(np.float32), (rgb / 255.0).astype(np.float32), np.zeros_like(xyz, dtype=np.float32)
        )
    else:
        pts, cols, nrm = read_point_cloud_ply(ply_path)
        pcd = BasicPointCloud(pts, cols, nrm)
    return SceneInfo(pcd, train, test, norm, ply_path)


def load_scene_info(path: str, white_background=False, eval_split=False, images="images") -> SceneInfo:
    """Dataset dispatch (scene/__init__.py:46-52)."""
    if os.path.exists(os.path.join(path, "sparse")):
        return read_colmap_scene(path, images, eval_split)
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        return read_blender_scene(path, white_background, eval_split)
    raise ValueError(f"Could not recognize scene type at {path}")
