"""Mesh extraction: TSDF fusion + marching tetrahedra (host-side numpy).

Replaces the reference's Open3D ScalableTSDFVolume + marching cubes pipeline
(utils/mesh_utils.py GaussianExtractor:81, extract_mesh_bounded:212,
post_process_mesh:30). Open3D is not available here; fusion is a dense
voxel-grid TSDF integrated per view, and iso-surfacing uses marching
TETRAHEDRA (6 tets per cube) — table-free and derivable from first
principles, at the cost of somewhat more triangles than marching cubes.

The mesh role in the reference (BVH visibility tracing) is covered by the
splat tracer; this module provides the user-facing mesh artifact + TSDF
parity (voxel_size = depth_trunc / mesh_res, sdf_trunc = 5 * voxel_size).
"""
from __future__ import annotations

import numpy as np

from materialrefgs_tpu.cameras import Camera

# Cube corner offsets and a 6-tetrahedra decomposition of the unit cube.
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    np.int32,
)
_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]],
    np.int32,
)


def content_bounds(
    cameras: list[Camera],
    depths: list[np.ndarray],
    alphas: list[np.ndarray],
    alpha_thres: float = 0.5,
    stride: int = 4,
    margin: float = 0.08,
):
    """Bounding sphere of the OBSERVED surface: backproject alpha-masked
    depth samples to world and bound them (the per-view frustum-crop analog
    of the reference's bounding-sphere estimate, mesh_utils.py:197). A
    content-tight volume multiplies the TSDF's effective resolution — the
    camera-ring bound wastes ~4-5x of the grid on empty space (round-2
    VERDICT item 5). Returns (center, radius, depth_trunc) or None when no
    surface was observed."""
    pts = []
    dmax = 0.0
    for cam, depth, alpha in zip(cameras, depths, alphas):
        d = depth[::stride, ::stride]
        a = alpha[::stride, ::stride]
        m = (a > alpha_thres) & (d > 0)
        if not m.any():
            continue
        H, W = depth.shape
        vi, ui = np.nonzero(m)
        z = d[vi, ui].astype(np.float32)
        dmax = max(dmax, float(z.max()))
        x = (ui * stride - float(cam.cx)) / float(cam.fx) * z
        y = (vi * stride - float(cam.cy)) / float(cam.fy) * z
        p_view = np.stack([x, y, z, np.ones_like(z)], axis=1)
        # world_view is W2V^T (row-vector convention); invert for V2W.
        v2w = np.linalg.inv(np.asarray(cam.world_view))
        pts.append((p_view @ v2w)[:, :3])
    if not pts:
        return None
    pts = np.concatenate(pts, axis=0)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    center = (lo + hi) * 0.5
    radius = float(np.max(hi - lo)) * 0.5 * (1.0 + margin) + 1e-6
    return center.astype(np.float32), radius, dmax * 1.1


def tsdf_fusion(
    cameras: list[Camera],
    depths: list[np.ndarray],  # (H, W) per view (alpha-masked: 0 = empty)
    alphas: list[np.ndarray],  # (H, W)
    center: np.ndarray,
    radius: float,
    resolution: int = 128,
    depth_trunc: float | None = None,
    sdf_trunc: float | None = None,
    alpha_thres: float = 0.5,
    chunk_voxels: int = 1 << 22,
):
    """Dense TSDF over a cube of half-size `radius` around `center`,
    integrated in z-slab chunks so >=512^3 grids stay in host memory.

    Returns (tsdf (R,R,R), weights, origin, voxel_size)."""
    R = resolution
    voxel = 2.0 * radius / R
    if depth_trunc is None:
        depth_trunc = radius * 2.0
    if sdf_trunc is None:
        sdf_trunc = 5.0 * voxel
    origin = np.asarray(center, np.float32) - radius

    ax = (origin[0] + (np.arange(R) + 0.5) * voxel).astype(np.float32)
    ay = (origin[1] + (np.arange(R) + 0.5) * voxel).astype(np.float32)
    az = (origin[2] + (np.arange(R) + 0.5) * voxel).astype(np.float32)

    tsdf = np.zeros((R, R, R), np.float32)
    weight = np.zeros((R, R, R), np.float32)
    wvs = [np.asarray(cam.world_view, np.float32) for cam in cameras]

    slab = max(1, chunk_voxels // (R * R))
    for x0 in range(0, R, slab):
        x1 = min(x0 + slab, R)
        gx, gy, gz = np.meshgrid(ax[x0:x1], ay, az, indexing="ij")
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        homog = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
        ts = np.zeros(len(pts), np.float32)
        ws = np.zeros(len(pts), np.float32)

        for cam, depth, alpha, wv in zip(cameras, depths, alphas, wvs):
            p_view = homog @ wv  # (N, 4) row-vector convention
            z = p_view[:, 2]
            valid = z > 0.05
            fx, fy = float(cam.fx), float(cam.fy)
            cx, cy = float(cam.cx), float(cam.cy)
            u = p_view[:, 0] * fx / np.maximum(z, 1e-8) + cx
            v = p_view[:, 1] * fy / np.maximum(z, 1e-8) + cy
            H, W = depth.shape
            ui = np.round(u).astype(np.int64)
            vi = np.round(v).astype(np.int64)
            valid &= (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            ui = np.clip(ui, 0, W - 1)
            vi = np.clip(vi, 0, H - 1)
            d = depth[vi, ui]
            a = alpha[vi, ui]
            valid &= (a > alpha_thres) & (d > 0) & (d < depth_trunc)
            sdf = (d - z) / sdf_trunc
            valid &= sdf > -1.0
            sdf = np.clip(sdf, -1.0, 1.0)
            w_new = np.where(valid, 1.0, 0.0).astype(np.float32)
            ts = (ts * ws + np.where(valid, sdf, 0.0) * w_new) / np.maximum(
                ws + w_new, 1e-8
            )
            ws = ws + w_new

        tsdf[x0:x1] = ts.reshape(x1 - x0, R, R)
        weight[x0:x1] = ws.reshape(x1 - x0, R, R)

    return tsdf, weight, origin, voxel


def marching_tetrahedra(tsdf: np.ndarray, weight: np.ndarray, origin, voxel, iso=0.0):
    """Iso-surface of the TSDF. Returns (vertices (V,3), faces (F,3))."""
    R = tsdf.shape[0]
    # Straddling-cube selection via shifted slices (no (R-1)^3 x 8 corner
    # tensor — that was 1.6 GB at 256^3 and made >=512^3 impossible): a cube
    # survives iff all 8 corners are observed and the iso level is crossed.
    obs = weight > 0
    in_full = tsdf < iso
    all_obs = np.ones((R - 1,) * 3, bool)
    any_in = np.zeros((R - 1,) * 3, bool)
    all_in = np.ones((R - 1,) * 3, bool)
    for dx, dy, dz in _CORNERS:
        sl = (
            slice(dx, R - 1 + dx),
            slice(dy, R - 1 + dy),
            slice(dz, R - 1 + dz),
        )
        all_obs &= obs[sl]
        any_in |= in_full[sl]
        all_in &= in_full[sl]
    cubes = np.argwhere(all_obs & any_in & ~all_in).astype(np.int32)
    if len(cubes) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    ci = (cubes[:, None, :] + _CORNERS[None, :, :]).reshape(-1, 3)
    vals = tsdf[ci[:, 0], ci[:, 1], ci[:, 2]].reshape(-1, 8)

    verts_out = []
    for tet in _TETS:
        tv = vals[:, tet]  # (C, 4)
        tin = tv < iso
        n_in = tin.sum(axis=1)
        tpos = (cubes[:, None, :] + _CORNERS[tet][None, :, :]).astype(np.float32)

        def interp(mask_rows, a_idx, b_idx):
            """Edge intersections for rows in mask: between local corners."""
            va = tv[mask_rows, a_idx]
            vb = tv[mask_rows, b_idx]
            t = (iso - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
            t = np.clip(t, 0.0, 1.0)[:, None]
            pa = tpos[mask_rows, a_idx]
            pb = tpos[mask_rows, b_idx]
            return pa + t * (pb - pa)

        for flip, k in ((False, 1), (True, 3)):
            # k corners inside (or, flipped, 1 outside) -> one triangle.
            rows = np.where(n_in == k)[0]
            if len(rows) == 0:
                continue
            # The lone corner (inside for k=1; outside for k=3).
            lone_mask = tin[rows] if k == 1 else ~tin[rows]
            lone = np.argmax(lone_mask, axis=1)
            others = np.array([[j for j in range(4) if j != l] for l in lone])
            tri = np.stack(
                [
                    interp(rows, lone, others[:, 0]),
                    interp(rows, lone, others[:, 1]),
                    interp(rows, lone, others[:, 2]),
                ],
                axis=1,
            )
            verts_out.append(tri)

        rows = np.where(n_in == 2)[0]
        if len(rows) > 0:
            # Two inside, two outside -> quad (two triangles) across 4 edges.
            ins = np.argsort(~tin[rows], axis=1)[:, :2]
            outs = np.argsort(tin[rows], axis=1)[:, :2]
            a, b = ins[:, 0], ins[:, 1]
            c, d = outs[:, 0], outs[:, 1]
            pac = interp(rows, a, c)
            pad = interp(rows, a, d)
            pbc = interp(rows, b, c)
            pbd = interp(rows, b, d)
            verts_out.append(np.stack([pac, pad, pbd], axis=1))
            verts_out.append(np.stack([pac, pbd, pbc], axis=1))

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tris = np.concatenate(verts_out, axis=0)  # (T, 3, 3) in voxel coords
    tris = origin[None, None, :] + (tris + 0.5) * voxel

    # Weld vertices.
    flat = tris.reshape(-1, 3)
    key = np.round(flat / (voxel * 1e-3)).astype(np.int64)
    _, uniq_idx, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
    verts = flat[uniq_idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # Drop degenerate faces.
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[good]


def keep_largest_component(verts: np.ndarray, faces: np.ndarray,
                           n_keep: int = 1):
    """post_process_mesh (mesh_utils.py:30): keep the `n_keep` largest
    connected clusters (reference opt.num_cluster, default 1)."""
    if len(faces) == 0:
        return verts, faces
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    adj = coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(len(verts), len(verts))
    )
    n, labels = connected_components(adj, directed=False)
    if n <= n_keep:
        return verts, faces
    counts = np.bincount(labels)
    kept = np.argsort(counts)[::-1][:n_keep]
    keep_v = np.isin(labels, kept)
    remap = -np.ones(len(verts), np.int64)
    remap[keep_v] = np.arange(keep_v.sum())
    keep_f = keep_v[faces].all(axis=1)
    return verts[keep_v], remap[faces[keep_f]].astype(np.int32)


def decimate_vertex_clustering(
    verts: np.ndarray, faces: np.ndarray, target_tris: int
):
    """Vertex-clustering decimation: snap vertices to a uniform grid, merge
    cells, drop collapsed faces. Coarsens the grid until the face count meets
    `target_tris`. Keeps thin occluders down to the final cell size — the
    property the traced specular visibility needs — while bounding the
    per-step mesh-trace cost (the reference's OptiX BVH has no such budget;
    this is the static-shape TPU analog)."""
    if len(faces) <= target_tris or len(faces) == 0:
        return verts, faces
    lo = verts.min(axis=0)
    extent = float(np.max(verts.max(axis=0) - lo)) + 1e-9
    # Initial guess: faces scale ~ 1/cell^2.
    cells = max(8, int(np.sqrt(target_tris)))
    for attempt in range(8):
        cell = extent / cells
        key = np.floor((verts - lo) / cell).astype(np.int64)
        _, uniq_idx, inv = np.unique(
            key, axis=0, return_index=True, return_inverse=True
        )
        f = inv[faces]
        good = (
            (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        )
        f = f[good]
        # Dedup faces (ignoring winding-preserving rotation).
        fs = np.sort(f, axis=1)
        _, fu = np.unique(fs, axis=0, return_index=True)
        f = f[np.sort(fu)]
        if len(f) <= target_tris or attempt == 7:
            # Cluster centroid placement (smoother than first-vertex).
            sums = np.zeros((len(uniq_idx), 3), np.float64)
            np.add.at(sums, inv, verts)
            counts = np.bincount(inv, minlength=len(uniq_idx))[:, None]
            v = (sums / np.maximum(counts, 1)).astype(np.float32)
            return v, f.astype(np.int32)
        cells = max(8, int(cells * np.sqrt(target_tris / max(len(f), 1)) * 0.95))


def write_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray):
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(verts.astype("<f4").tobytes())
        fdata = np.empty(len(faces), dtype=[("n", "u1"), ("v", "<i4", 3)])
        fdata["n"] = 3
        fdata["v"] = faces
        f.write(fdata.tobytes())


def read_mesh_ply(path: str):
    """Read a triangle mesh PLY in the write_mesh_ply layout (binary-LE,
    xyz vertices + uchar/int32 face lists). Returns (verts (V,3) f32,
    faces (T,3) i32)."""
    with open(path, "rb") as f:
        n_vert = n_face = 0
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n_vert = int(line.split()[-1])
            elif line.startswith("element face"):
                n_face = int(line.split()[-1])
            elif line == "end_header":
                break
        verts = np.frombuffer(f.read(n_vert * 12), dtype="<f4").reshape(n_vert, 3)
        fdt = np.dtype([("n", "u1"), ("v", "<i4", 3)])
        faces = np.frombuffer(f.read(n_face * fdt.itemsize), dtype=fdt)["v"]
    return verts.copy(), faces.astype(np.int32).copy()


def extract_mesh(
    cameras: list[Camera],
    depths: list[np.ndarray],
    alphas: list[np.ndarray],
    resolution: int = 128,
    post_process: bool = True,
    num_cluster: int = 1,
):
    """GaussianExtractor.reconstruction + extract_mesh_bounded equivalent.

    The volume is cropped to the observed surface (content_bounds) when any
    exists — at the reference's mesh_res=1024 over the full camera-ring
    bound (train_refnerf.py:1078, mesh_utils.py:212) the voxel size matches
    ours at `resolution`~256 over the tight crop. Falls back to the
    camera-ring bound for empty/degenerate depth sets."""
    cb = content_bounds(cameras, depths, alphas)
    if cb is not None:
        center, radius, depth_trunc = cb
    else:
        centers = np.stack([np.asarray(c.camera_center) for c in cameras])
        center = centers.mean(axis=0)
        radius = float(np.max(np.linalg.norm(centers - center, axis=-1))) * 1.1
        depth_trunc = None
    tsdf, w, origin, voxel = tsdf_fusion(
        cameras, depths, alphas, center, radius, resolution,
        depth_trunc=depth_trunc,
    )
    verts, faces = marching_tetrahedra(tsdf, w, origin, voxel)
    if post_process:
        verts, faces = keep_largest_component(verts, faces, num_cluster)
    return verts, faces


def _contract(x: np.ndarray) -> np.ndarray:
    """Mip-NeRF-360 scene contraction (mesh_utils.py:309 unbounded variant):
    identity inside the unit ball, 2 - 1/||x|| radially outside."""
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    n = np.maximum(n, 1e-9)
    return np.where(n <= 1.0, x, (2.0 - 1.0 / n) * x / n)


def _uncontract(y: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(y, axis=-1, keepdims=True)
    n = np.maximum(n, 1e-9)
    return np.where(n <= 1.0, y, y / (n * (2.0 - n)))


def extract_mesh_unbounded(
    cameras: list[Camera],
    depths: list[np.ndarray],
    alphas: list[np.ndarray],
    resolution: int = 128,
    post_process: bool = True,
    num_cluster: int = 1,
):
    """Unbounded scene variant (extract_mesh_unbounded, mesh_utils.py:309):
    TSDF over the CONTRACTED space [-2, 2]^3, marching tetrahedra, vertices
    mapped back through the inverse contraction. Scene scale is normalized by
    the camera-ring radius first."""
    centers = np.stack([np.asarray(c.camera_center) for c in cameras])
    center = centers.mean(axis=0)
    scale = float(np.max(np.linalg.norm(centers - center, axis=-1))) + 1e-6

    R = resolution
    half = 2.0
    voxel = 2 * half / R
    origin = -np.full(3, half, np.float32)
    ax = origin[0] + (np.arange(R) + 0.5) * voxel
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    ypts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    # world sample positions: uncontract then denormalize.
    wpts = _uncontract(ypts) * scale + center
    homog = np.concatenate([wpts, np.ones((len(wpts), 1), np.float32)], axis=1)

    tsdf = np.zeros(len(wpts), np.float32)
    weight = np.zeros(len(wpts), np.float32)
    sdf_trunc = 5.0 * voxel * scale

    for cam, depth, alpha in zip(cameras, depths, alphas):
        wv = np.asarray(cam.world_view)
        p_view = homog @ wv
        z = p_view[:, 2]
        valid = z > 0.05
        u = p_view[:, 0] * float(cam.fx) / np.maximum(z, 1e-8) + float(cam.cx)
        v = p_view[:, 1] * float(cam.fy) / np.maximum(z, 1e-8) + float(cam.cy)
        H, W = depth.shape
        ui = np.clip(np.round(u).astype(np.int64), 0, W - 1)
        vi = np.clip(np.round(v).astype(np.int64), 0, H - 1)
        valid &= (u >= 0) & (u < W) & (v >= 0) & (v < H)
        d = depth[vi, ui]
        a = alpha[vi, ui]
        valid &= (a > 0.5) & (d > 0)
        sdf = np.clip((d - z) / sdf_trunc, -1.0, 1.0)
        valid &= sdf > -1.0
        w_new = np.where(valid, 1.0, 0.0).astype(np.float32)
        tsdf = (tsdf * weight + np.where(valid, sdf, 0.0) * w_new) / np.maximum(
            weight + w_new, 1e-8
        )
        weight += w_new

    shape = (R, R, R)
    verts, faces = marching_tetrahedra(
        tsdf.reshape(shape), weight.reshape(shape), origin, voxel
    )
    if len(verts):
        verts = _uncontract(verts) * scale + center
    if post_process:
        verts, faces = keep_largest_component(verts, faces, num_cluster)
    return verts, faces
