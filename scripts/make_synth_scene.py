"""Generate a Shiny-Blender-style synthetic dataset with a vectorized numpy
ray tracer: a glossy (mirror-like) sphere + a diffuse sphere on a checkered
ground disk, lit by a procedural HDR environment, with true one-bounce
reflections. Multi-view consistent by construction, so it exercises the
reflective-material pipeline (env light, metallic/roughness, indirect) the
same way the reference's Shiny Blender Synthetic scenes do (README.md:60-63).

Output layout matches the Blender/NeRF dataset contract the data layer reads
(reference scene/dataset_readers.py:249-330): transforms_{train,test}.json +
RGBA PNGs + points3d.ply.

Usage: python scripts/make_synth_scene.py --out /tmp/synth_scene \
           [--res 400] [--n_train 60] [--n_test 20] [--init surface]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------- geometry --

SPHERES = [
    # (center, radius, albedo, metallic, roughness)
    (np.array([0.0, 0.0, 0.55]), 0.55, np.array([0.95, 0.93, 0.90]), 0.92, 0.05),
    (np.array([0.95, 0.45, 0.28]), 0.28, np.array([0.75, 0.15, 0.12]), 0.0, 0.8),
    (np.array([-0.75, -0.65, 0.22]), 0.22, np.array([0.12, 0.35, 0.75]), 0.0, 0.8),
]
GROUND_R = 2.0  # checkered disk at z=0
SUN_DIR = np.array([0.45, -0.35, 0.82])
SUN_DIR = SUN_DIR / np.linalg.norm(SUN_DIR)
SUN_COL = np.array([1.0, 0.96, 0.88]) * 2.2


def env_radiance(d):
    """Procedural environment: sky gradient + sun + two colored blobs.

    d: (..., 3) unit directions -> (..., 3) linear radiance."""
    z = d[..., 2:3]
    t = np.clip(0.5 * (z + 1.0), 0, 1)
    horizon = np.array([0.82, 0.74, 0.62])
    zenith = np.array([0.18, 0.32, 0.62])
    sky = horizon * (1 - t) + zenith * t
    cos_sun = np.clip(np.sum(d * SUN_DIR, axis=-1, keepdims=True), 0, 1)
    sun = SUN_COL * np.exp((cos_sun - 1.0) * 220.0)
    b1d = np.array([-0.7, 0.6, 0.35])
    b1d = b1d / np.linalg.norm(b1d)
    c1 = np.clip(np.sum(d * b1d, axis=-1, keepdims=True), 0, 1)
    blob1 = np.array([0.9, 0.25, 0.55]) * np.exp((c1 - 1.0) * 40.0) * 0.8
    b2d = np.array([0.2, 0.9, 0.25])
    b2d = b2d / np.linalg.norm(b2d)
    c2 = np.clip(np.sum(d * b2d, axis=-1, keepdims=True), 0, 1)
    blob2 = np.array([0.2, 0.8, 0.35]) * np.exp((c2 - 1.0) * 60.0) * 0.7
    return sky + sun + blob1 + blob2


def intersect(o, d):
    """Nearest hit over spheres + ground disk.

    Returns (t, hit_id) with hit_id: -1 miss, 0..n-1 spheres, 99 ground."""
    N = o.shape[0]
    t_best = np.full(N, np.inf)
    hid = np.full(N, -1, np.int32)
    for i, (c, r, *_rest) in enumerate(SPHERES):
        oc = o - c
        b = np.sum(oc * d, axis=-1)
        cc = np.sum(oc * oc, axis=-1) - r * r
        disc = b * b - cc
        ok = disc > 0
        sq = np.sqrt(np.maximum(disc, 0))
        t0 = -b - sq
        t1 = -b + sq
        t = np.where(t0 > 1e-4, t0, t1)
        ok &= t > 1e-4
        upd = ok & (t < t_best)
        t_best = np.where(upd, t, t_best)
        hid = np.where(upd, i, hid)
    dz = d[..., 2]
    tg = np.where(np.abs(dz) > 1e-8, -o[..., 2] / np.where(np.abs(dz) > 1e-8, dz, 1.0), np.inf)
    pg = o + tg[..., None] * d
    okg = (tg > 1e-4) & (np.linalg.norm(pg[..., :2], axis=-1) < GROUND_R)
    upd = okg & (tg < t_best)
    t_best = np.where(upd, tg, t_best)
    hid = np.where(upd, 99, hid)
    return t_best, hid


def shadow(p):
    """1 if sun visible from p (+normal offset applied by caller)."""
    t, hid = intersect(p, np.broadcast_to(SUN_DIR, p.shape))
    return (hid < 0).astype(np.float64)


def shade_local(p, n, albedo, rough):
    """Diffuse + ambient with analytic sun shadowing."""
    amb_d = n * 0.9 + np.array([0, 0, 0.44])
    amb_d = amb_d / np.linalg.norm(amb_d, axis=-1, keepdims=True)
    ambient = env_radiance(amb_d) * 0.35
    ndl = np.clip(np.sum(n * SUN_DIR, axis=-1, keepdims=True), 0, 1)
    sh = shadow(p + n * 1e-3)[..., None]
    return albedo * (ambient + SUN_COL * 0.55 * ndl * sh)


def surface_props(p, hid):
    """(normal, albedo, metallic, roughness) per hit point."""
    N = p.shape[0]
    n = np.zeros((N, 3))
    alb = np.zeros((N, 3))
    met = np.zeros((N, 1))
    rough = np.ones((N, 1))
    for i, (c, r, a, m, rg) in enumerate(SPHERES):
        msk = hid == i
        n[msk] = (p[msk] - c) / r
        alb[msk] = a
        met[msk] = m
        rough[msk] = rg
    g = hid == 99
    n[g] = [0, 0, 1]
    check = ((np.floor(p[g, 0] / 0.5) + np.floor(p[g, 1] / 0.5)) % 2).astype(bool)
    alb[g] = np.where(check[:, None], [0.62, 0.60, 0.58], [0.22, 0.21, 0.20])
    met[g] = 0.0
    rough[g] = 0.9
    return n, alb, met, rough


def trace(o, d, depth=0, bg_env=False):
    """Returns (rgb, alpha) for rays (N,3). bg_env renders the environment
    on primary-ray misses (COLMAP/real-scene stand-in: photos have no alpha)."""
    t, hid = intersect(o, d)
    hit = hid >= 0
    rgb = np.zeros_like(o)
    rgb[~hit] = env_radiance(d[~hit]) if (depth > 0 or bg_env) else 0.0
    if not hit.any():
        return rgb, hit.astype(np.float64)
    p = o[hit] + t[hit, None] * d[hit]
    n, alb, met, rough = surface_props(p, hid[hit])
    base = shade_local(p, n, alb, rough)
    # One-bounce glossy reflection for metallic surfaces.
    refl_needed = (met[:, 0] > 0.01) & (depth < 2)
    col = base * (1 - met)
    if refl_needed.any():
        dv = d[hit][refl_needed]
        nv = n[refl_needed]
        rdir = dv - 2 * np.sum(dv * nv, axis=-1, keepdims=True) * nv
        rdir = rdir / np.linalg.norm(rdir, axis=-1, keepdims=True)
        rrgb, _ = trace(p[refl_needed] + nv * 1e-3, rdir, depth + 1)
        # Fresnel-ish: F0 mix with albedo tint
        cosv = np.clip(-np.sum(dv * nv, axis=-1, keepdims=True), 0, 1)
        f = 0.94 + 0.06 * (1 - cosv) ** 5
        spec = rrgb * f * alb[refl_needed]
        col[refl_needed] += met[refl_needed] * spec
    rgb[hit] = col
    return rgb, hit.astype(np.float64)


# ----------------------------------------------------------------- cameras --


def look_at_c2w(eye, target, up=np.array([0.0, 0.0, 1.0])):
    """OpenGL/Blender c2w: camera -Z looks at target."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w


def render_view(c2w, res, fov_x, spp=2, seed=0, bg_env=False):
    f = 0.5 * res / np.tan(0.5 * fov_x)
    rng = np.random.default_rng(seed)
    acc = np.zeros((res * res, 3))
    aac = np.zeros(res * res)
    for s in range(spp):
        jx, jy = rng.random(2) if spp > 1 else (0.5, 0.5)
        yy, xx = np.mgrid[0:res, 0:res]
        x = (xx.ravel() + jx - 0.5 * res) / f
        y = -(yy.ravel() + jy - 0.5 * res) / f
        dirs_cam = np.stack([x, y, -np.ones_like(x)], axis=-1)
        dirs = dirs_cam @ c2w[:3, :3].T
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[:3, 3], dirs.shape).copy()
        rgb, a = trace(o, dirs, bg_env=bg_env)
        acc += rgb
        aac += a
    rgb = (acc / spp).reshape(res, res, 3)
    alpha = (aac / spp).reshape(res, res)
    # linear -> sRGB-ish tonemap
    rgb = np.clip(rgb, 0, 1) ** (1 / 2.2)
    return rgb, alpha


# ------------------------------------------------------------ COLMAP writer --


def _quat_from_R_wxyz(R):
    """Shepperd's branch-on-largest-diagonal rotation->quaternion (w,x,y,z)."""
    t = R[0, 0] + R[1, 1] + R[2, 2]
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        q = [s / 4, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        q = [(R[2, 1] - R[1, 2]) / s, s / 4, (R[0, 1] + R[1, 0]) / s,
             (R[0, 2] + R[2, 0]) / s]
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 - R[0, 0] + R[1, 1] - R[2, 2]) * 2.0
        q = [(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, s / 4,
             (R[1, 2] + R[2, 1]) / s]
    else:
        s = np.sqrt(1.0 - R[0, 0] - R[1, 1] + R[2, 2]) * 2.0
        q = [(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
             (R[1, 2] + R[2, 1]) / s, s / 4]
    q = np.asarray(q)
    return q if q[0] >= 0 else -q


def write_colmap_sparse(out, c2ws, names, res, fov_x, pts, cols):
    """Write sparse/0/{cameras,images,points3D}.bin in COLMAP binary format
    (data/colmap_loader.py read_*_binary contracts; exercises the C++
    native_io fast path end-to-end). c2ws are Blender/OpenGL c2w matrices."""
    import struct

    sp = os.path.join(out, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    f_px = 0.5 * res / np.tan(0.5 * fov_x)
    with open(os.path.join(sp, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        # PINHOLE model_id=1: fx fy cx cy
        f.write(struct.pack("<iiQQ", 1, 1, res, res))
        f.write(struct.pack("<4d", f_px, f_px, res / 2.0, res / 2.0))
    with open(os.path.join(sp, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(c2ws)))
        for i, (c2w, name) in enumerate(zip(c2ws, names)):
            cv = c2w.copy()
            cv[:3, 1:3] *= -1  # OpenGL -> OpenCV camera axes
            w2c = np.linalg.inv(cv)
            q = _quat_from_R_wxyz(w2c[:3, :3])
            f.write(struct.pack("<idddddddi", i + 1, *q, *w2c[:3, 3], 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points
    with open(os.path.join(sp, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        rgb8 = np.clip(cols * 255, 0, 255).astype(np.uint8)
        for i in range(len(pts)):
            f.write(struct.pack("<QdddBBBd", i, *pts[i].astype(np.float64),
                                *rgb8[i], 0.5))
            f.write(struct.pack("<Q", 0))  # empty track


def sample_points(n, rng):
    """Near-surface samples with albedo colors (COLMAP-init stand-in)."""
    pts, cols = [], []
    per = n // (len(SPHERES) + 1)
    for c, r, a, m, rg in SPHERES:
        d = rng.normal(size=(per, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts.append(c + d * r * (1 + 0.02 * rng.standard_normal((per, 1))))
        cols.append(np.broadcast_to(a, (per, 3)))
    ng = n - per * len(SPHERES)
    ang = rng.random(ng) * 2 * np.pi
    rad = GROUND_R * np.sqrt(rng.random(ng))
    g = np.stack([rad * np.cos(ang), rad * np.sin(ang), 0.01 * rng.standard_normal(ng)], -1)
    pts.append(g)
    cols.append(np.broadcast_to([0.4, 0.4, 0.4], (ng, 3)))
    return np.concatenate(pts).astype(np.float32), np.concatenate(cols).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=400)
    ap.add_argument("--n_train", type=int, default=60)
    ap.add_argument("--n_test", type=int, default=20)
    ap.add_argument("--fov_x", type=float, default=0.8)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--n_points", type=int, default=100_000)
    ap.add_argument("--init", choices=["surface", "random"], default="surface")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument(
        "--layout", choices=["blender", "glossy", "colmap"], default="blender",
        help="blender: transforms_{train,test}.json + {train,test}/ RGBA "
             "(Shiny Blender Synthetic); glossy: same jsons but images under "
             "rgb/ with alpha masks (nero2blender GlossySynthetic layout, "
             "train_glossy.py:101-134); colmap: images/ RGB photos + "
             "sparse/0 binary model, env background, llffhold eval split "
             "(Shiny Blender Real / refreal layout)")
    args = ap.parse_args()

    from PIL import Image

    from materialrefgs_tpu.data.readers import write_point_cloud_ply

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    target = np.array([0.0, 0.0, 0.35])
    golden = np.pi * (3 - np.sqrt(5))

    def spiral_c2w(i, split):
        az = i * golden + (0.5 if split == "test" else 0.0)
        el = np.deg2rad(12 + 55 * ((i * 0.61803) % 1.0))
        eye = target + 3.3 * np.array(
            [np.cos(az) * np.cos(el), np.sin(az) * np.cos(el), np.sin(el)]
        )
        return look_at_c2w(eye, target)

    if args.init == "surface":
        pts, cols = sample_points(args.n_points, rng)
    else:
        pts = (rng.random((args.n_points, 3)) * 2.6 - 1.3).astype(np.float32)
        cols = rng.random((args.n_points, 3)).astype(np.float32)

    if args.layout == "colmap":
        # Real-photo stand-in: one images/ dir, env-lit background, binary
        # sparse model; the reader's llffhold=8 split makes train/test.
        img_dir = os.path.join(args.out, "images")
        os.makedirs(img_dir, exist_ok=True)
        n = args.n_train + args.n_test
        c2ws, names = [], []
        for i in range(n):
            c2w = spiral_c2w(i, "train")
            rgb, _ = render_view(
                c2w, args.res, args.fov_x, args.spp, seed=i, bg_env=True
            )
            name = f"r_{i:03d}.png"
            Image.fromarray((rgb * 255).astype(np.uint8), "RGB").save(
                os.path.join(img_dir, name)
            )
            c2ws.append(c2w)
            names.append(name)
        write_colmap_sparse(
            args.out, c2ws, names, args.res, args.fov_x, pts, cols
        )
        print(f"colmap: {n} views @ {args.res}^2, sparse/0 bin model "
              f"({len(pts)} pts)")
        return

    img_sub = {"blender": None, "glossy": "rgb"}[args.layout]
    if img_sub:
        os.makedirs(os.path.join(args.out, img_sub), exist_ok=True)
    for split, n in [("train", args.n_train), ("test", args.n_test)]:
        if not img_sub:
            os.makedirs(os.path.join(args.out, split), exist_ok=True)
        frames = []
        for i in range(n):
            c2w = spiral_c2w(i, split)
            rgb, alpha = render_view(c2w, args.res, args.fov_x, args.spp, seed=i)
            im = np.concatenate([rgb, alpha[..., None]], axis=-1)
            stem = (f"{img_sub}/r_{split}_{i}" if img_sub
                    else f"{split}/r_{i}")
            Image.fromarray((im * 255).astype(np.uint8), "RGBA").save(
                os.path.join(args.out, stem + ".png")
            )
            frames.append(
                {"file_path": stem, "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(args.out, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": args.fov_x, "frames": frames}, f)
        print(f"{split}: {n} views @ {args.res}^2 ({args.layout})")

    write_point_cloud_ply(os.path.join(args.out, "points3d.ply"), pts, cols)
    print(f"points3d.ply: {len(pts)} pts ({args.init})")


if __name__ == "__main__":
    main()
