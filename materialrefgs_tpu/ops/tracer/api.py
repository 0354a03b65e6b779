"""Bundle splat tracer API: clustering, cone culling, pair binning, tracing.

TPU-native replacement for the EnvGS OptiX tracer (optix_utils.py
HardwareRendering.render_gaussians) and for the BVH mesh tracer's visibility
role (raytracing_brdf): rays are grouped into bundles of 256, gaussians into
Morton clusters of 256; (bundle, cluster) cone culling + per-gaussian exact
cone tests produce depth-sorted per-bundle pair lists traced by the Pallas
kernels.

Compositing order: chunks stream in center-depth order; within each chunk
TracerConfig.exact_order=True composites every ray in ITS OWN hit-t order
(per-ray comparator matmuls in the kernels, fwd AND bwd — the production
training path), while exact_order=False shares the bundle's list order
(faster approximation; fine for visibility-style traces). Color is per-ray
SH in both modes. The reference's own tracer is not vendored (SURVEY §1.1),
so behavioral tests compare against our exact-order jnp reference tracer.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.ops.knn import _morton3d
from materialrefgs_tpu.ops.rasterize.layout import K_CHUNK
from materialrefgs_tpu.ops.segments import build_aligned_segments, scatter_pairs
from materialrefgs_tpu.ops.tracer import pallas_kernels as pk
from materialrefgs_tpu.ops.tracer.pallas_kernels import C_OUT, NRAY  # noqa: F401
from materialrefgs_tpu.utils.transforms import quat_to_rotmat

CLUSTER = 256


@dataclass(frozen=True)
class TracerConfig:
    pair_capacity: int = 1 << 19
    cluster_pair_capacity: int = 1 << 14
    tmin: float = 1e-3
    interpret: bool = False
    # Mesh-tracer cluster pre-cull survivor budget per 256-ray block
    # (ops.mesh_tracer.trace cull_cap); exact while cull_dropped == 0.
    mesh_cull_cap: int = 64
    # EXACT per-ray compositing order WITHIN each 128-pair chunk (per-ray
    # comparator matmuls; cross-chunk interleaving stays center-depth
    # ordered). Supported in forward AND backward — training gradients
    # match the eval compositing (VERDICT r2 item 2).
    exact_order: bool = False


class _Prepared(NamedTuple):
    order: jax.Array  # (Pc,) morton order (padded with P-index sentinel)
    centers: jax.Array  # (G, 3) cluster centers
    radii: jax.Array  # (G,) cluster bounding radii (incl. 3-sigma splat extent)
    cluster_alive: jax.Array  # (G,) any alive gaussian in the cluster


def _cluster_gaussians(means3d, scales, alive_mask):
    """Morton-sort alive gaussians into clusters of 256."""
    P = means3d.shape[0]
    G = (P + CLUSTER - 1) // CLUSTER
    Pc = G * CLUSTER
    lo = jnp.min(jnp.where(alive_mask[:, None], means3d, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(alive_mask[:, None], means3d, -jnp.inf), axis=0)
    q = (
        (means3d - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0
    ).astype(jnp.int32)
    q = jnp.clip(q, 0, 1023)
    code = _morton3d(q)
    # Dead gaussians sort last.
    code = jnp.where(alive_mask, code, jnp.int32(0x3FFFFFFF))
    order = jnp.argsort(code, stable=True)
    if Pc > P:
        order = jnp.concatenate([order, jnp.full(Pc - P, P - 1, order.dtype)])

    pts = means3d[order].reshape(G, CLUSTER, 3)
    r3 = 3.0 * jnp.max(scales, axis=-1)
    r3 = jnp.where(alive_mask, r3, 0.0)[order].reshape(G, CLUSTER)
    w = alive_mask[order].reshape(G, CLUSTER)
    wsum = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1)
    centers = jnp.sum(pts * w[..., None], axis=1) / wsum
    dist = jnp.linalg.norm(pts - centers[:, None], axis=-1)
    radii = jnp.max(jnp.where(w, dist + r3, 0.0), axis=1)
    # All-dead clusters get center (0,0,0) / radius 0 — the scene origin,
    # which reflected-ray cones routinely contain. Without an explicit alive
    # mask they pass the stage-1 cone test, flood the cluster-pair budget
    # (capacity-P >> alive-P means MOST clusters are dead), displace real
    # clusters from the fixed-size nonzero() list, and megainflate the
    # overflow counter (round-3 flagship: 26M reported at surfel2 onset).
    return _Prepared(
        order=order, centers=centers, radii=radii,
        cluster_alive=jnp.sum(w, axis=1) > 0,
    )


def _bundle_stats(rays_o, rays_d):
    """(NB,256,3)x2 -> per-bundle centroid, mean dir, origin radius, tan(theta)."""
    o_c = jnp.mean(rays_o, axis=1)  # (NB,3)
    from materialrefgs_tpu.utils.transforms import normalize as _safe_norm

    d_n = _safe_norm(rays_d)
    d_c = _safe_norm(jnp.mean(d_n, axis=1))
    r0 = jnp.max(jnp.linalg.norm(rays_o - o_c[:, None], axis=-1), axis=1)
    cosm = jnp.min(jnp.sum(d_n * d_c[:, None], axis=-1), axis=1)
    cosm = jnp.clip(cosm, 1e-3, 1.0)
    tant = jnp.sqrt(jnp.maximum(1.0 - cosm**2, 0.0)) / cosm
    return o_c, d_c, r0, tant


def _cone_test(p, r_obj, o_c, d_c, r0, tant, tmin):
    """Conservative sphere-vs-cone: p (..., 3) against a bundle cone."""
    v = p - o_c
    t = jnp.sum(v * d_c, axis=-1)
    perp2 = jnp.maximum(jnp.sum(v * v, axis=-1) - t * t, 0.0)
    lim = r0 + r_obj + jnp.maximum(t, 0.0) * tant
    return (t >= tmin - r0 - r_obj) & (perp2 <= lim * lim), t


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3)
)
def _trace_core(tmin, interpret, exact_order, n_sh, payload, rays, seg_start, seg_count):
    return pk.trace_bundles_fwd(
        payload, rays, seg_start, seg_count, n_sh=n_sh, tmin=tmin,
        interpret=interpret, exact_order=exact_order,
    )


def _trace_core_fwd(tmin, interpret, exact_order, n_sh, payload, rays, seg_start, seg_count):
    out = _trace_core(
        tmin, interpret, exact_order, n_sh, payload, rays, seg_start, seg_count
    )
    return out, (payload, rays, seg_start, seg_count, out)


def _trace_core_bwd(tmin, interpret, exact_order, n_sh, res, g):
    payload, rays, seg_start, seg_count, fwd_out = res
    if exact_order:
        # The exact-order backward reconstructs per-ray prefixes from the
        # saved total log-T, which spans every chunk the forward processed
        # (including trailing all-excluded ones) — walk exactly that many.
        seg_active = (
            jnp.max(fwd_out[..., pk.OUT_NPROC], axis=1).astype(jnp.int32)
            * K_CHUNK
        )
    else:
        seg_active = jnp.max(fwd_out[..., pk.OUT_NCONTRIB], axis=1).astype(jnp.int32)
    dpay, drays = pk.trace_bundles_bwd(
        payload, rays, seg_start, seg_count, seg_active, fwd_out, g,
        n_sh=n_sh, tmin=tmin, interpret=interpret, exact_order=exact_order,
    )
    z = np.zeros(seg_start.shape, jax.dtypes.float0)
    zc = np.zeros(seg_count.shape, jax.dtypes.float0)
    return dpay, drays, z, zc


_trace_core.defvjp(_trace_core_fwd, _trace_core_bwd)


def _cull(ro, rd, means3d, scales, opacities, config: TracerConfig, bundle_mask):
    """Stages 1+2 of the trace: (bundle, cluster) cone cull, then exact
    per-gaussian cone tests. Returns (gauss ids (CP,256), bundle-of-pair,
    t_proj, okg validity, cluster_overflow)."""
    NB = ro.shape[0]
    P = means3d.shape[0]
    o_c, d_c, r0, tant = _bundle_stats(ro, rd)

    alive = opacities >= (1.0 / 255.0)
    prep = _cluster_gaussians(means3d, scales, alive)
    G = prep.centers.shape[0]

    # Stage 1: (bundle, cluster) cone culling.
    ok_bc, _ = _cone_test(
        prep.centers[None, :, :],
        prep.radii[None, :],
        o_c[:, None, :],
        d_c[:, None, :],
        r0[:, None],
        tant[:, None],
        config.tmin,
    )  # (NB, G)
    ok_bc = ok_bc & prep.cluster_alive[None, :]
    if bundle_mask is not None:
        ok_bc = ok_bc & bundle_mask.reshape(NB, 1)
    flat_idx = jnp.nonzero(
        ok_bc.reshape(-1), size=config.cluster_pair_capacity, fill_value=NB * G
    )[0]
    cp_b = jnp.minimum(flat_idx // G, NB - 1)
    cp_c = jnp.minimum(flat_idx % G, G - 1)
    cp_valid = flat_idx < NB * G
    # Stage-1 truncation is as silent as jnp.nonzero's size= contract —
    # count it so the total overflow stays loud (the pairs beyond the cap
    # belong to the HIGHEST-index bundles, i.e. whole image regions).
    # Scaled by CLUSTER so the total below is in gaussian-pair units like
    # seg.overflow (a truncated cluster pair loses up to CLUSTER gaussians).
    cluster_overflow = CLUSTER * jnp.maximum(
        jnp.sum(ok_bc.astype(jnp.int32)) - config.cluster_pair_capacity, 0
    )

    # Stage 2: expand clusters to gaussians, exact per-gaussian cone test.
    # Component-wise gathers: a (CP*256, 3) gather gets its minor dim padded
    # 3 -> 128 lanes by the TPU layout (42x HBM waste — 8 GB per tensor at
    # escalated capacities, the round-3 OOM); per-component (CP, 256) f32
    # gathers tile cleanly, and the bundle stats only need a (CP,) gather
    # broadcast across lanes.
    lanes = jnp.arange(CLUSTER, dtype=jnp.int32)[None, :]
    gidx_sorted = cp_c[:, None] * CLUSTER + lanes  # index into morton order
    gauss = prep.order[gidx_sorted]  # (CP, 256) original gaussian ids
    b_of = jnp.broadcast_to(cp_b[:, None], gauss.shape)
    px = means3d[:, 0][gauss]
    py = means3d[:, 1][gauss]
    pz = means3d[:, 2][gauss]
    r_g = (3.0 * jnp.max(scales, axis=-1))[gauss]
    vx = px - o_c[cp_b, 0][:, None]
    vy = py - o_c[cp_b, 1][:, None]
    vz = pz - o_c[cp_b, 2][:, None]
    t_proj = (
        vx * d_c[cp_b, 0][:, None]
        + vy * d_c[cp_b, 1][:, None]
        + vz * d_c[cp_b, 2][:, None]
    )
    perp2 = jnp.maximum(vx * vx + vy * vy + vz * vz - t_proj * t_proj, 0.0)
    r0_b = r0[cp_b][:, None]
    lim = r0_b + r_g + jnp.maximum(t_proj, 0.0) * tant[cp_b][:, None]
    okg = (t_proj >= config.tmin - r0_b - r_g) & (perp2 <= lim * lim)
    # Mask morton-order padding lanes (duplicated last gaussian) and dupes.
    okg = okg & cp_valid[:, None] & alive[gauss] & (gidx_sorted < P)
    return gauss, b_of, t_proj, okg, cluster_overflow


def trace_demand(
    rays_o: jax.Array,
    rays_d: jax.Array,
    means3d: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    config: TracerConfig = TracerConfig(),
    bundle_mask: jax.Array | None = None,
) -> jax.Array:
    """Pair DEMAND of a would-be trace (() int32): the cull stages only, no
    binning/kernel. The trainer probes this at stage boundaries to size
    pair_capacity so the first traced step is overflow-free by construction
    (round-4 item 8: reactive escalation means >=OVERFLOW_CHECK_EVERY steps
    of truncated supervision right at onset). Run with a generously sized
    cluster_pair_capacity: cluster-truncated pairs are invisible to demand."""
    N = rays_o.shape[0]
    assert N % NRAY == 0, N
    NB = N // NRAY
    ro = rays_o.reshape(NB, NRAY, 3)
    rd = rays_d.reshape(NB, NRAY, 3)
    _, _, _, okg, cluster_overflow = _cull(
        ro, rd, means3d, scales, opacities, config, bundle_mask
    )
    return jnp.sum(okg.astype(jnp.int32)) + cluster_overflow


def trace(
    rays_o: jax.Array,  # (N, 3); N must be a multiple of 256
    rays_d: jax.Array,  # (N, 3)
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,  # (P,)
    shs: jax.Array,  # (P, K_sh, 3) SH coefficients (deg via K_sh)
    config: TracerConfig = TracerConfig(),
    sh_degree: int = 3,
    bundle_mask: jax.Array | None = None,  # (N/256,) bool: trace this bundle?
) -> dict:
    """Trace rays against a surfel cloud. Returns per-ray rgb/acc/depth/normal.

    `bundle_mask=False` bundles produce zero output (rgb/acc/depth/normal=0,
    final_T=1) at near-zero cost: their (bundle, cluster) pairs are culled in
    stage 1, so they bin no gaussian pairs and the kernel's per-bundle
    while-loop exits immediately. Callers use this to skip rays whose traced
    result is multiplied away downstream — the reference traces visibility
    only where render_alpha > 0 (refl_utils.py:319-330) and its indirect
    light is alpha-gated in shading (refl_utils.py:364-401)."""
    N = rays_o.shape[0]
    assert N % NRAY == 0, N
    NB = N // NRAY

    ro = rays_o.reshape(NB, NRAY, 3)
    rd = rays_d.reshape(NB, NRAY, 3)
    gauss, b_of, t_proj, okg, cluster_overflow = _cull(
        ro, rd, means3d, scales, opacities, config, bundle_mask
    )
    P = means3d.shape[0]
    seg = build_aligned_segments(
        b_of.reshape(-1),
        t_proj.reshape(-1),
        okg.reshape(-1),
        NB,
        config.pair_capacity,
    )
    # Per-pair payload (pay_rows(n_sh), B + K): geometry rows + raw SH rows
    # (channel-major) — color is evaluated PER RAY inside the kernel at each
    # ray's own unit direction (optix_utils.py:84-271 contract).
    B = config.pair_capacity
    n_sh = (sh_degree + 1) ** 2
    assert shs.shape[1] >= n_sh, (shs.shape, n_sh)
    C_PAY = pk.pay_rows(n_sh)
    gauss_flat = gauss.reshape(-1)
    pair_gauss = scatter_pairs(
        jnp.where(okg.reshape(-1), gauss_flat, 0), seg.perm_pos, B
    )
    pair_valid = scatter_pairs(okg.reshape(-1), seg.perm_pos, B, fill=False)

    R = quat_to_rotmat(rotations)
    tu_s = R[:, :, 0] / jnp.maximum(scales[:, 0:1], 1e-12)
    tv_s = R[:, :, 1] / jnp.maximum(scales[:, 1:2], 1e-12)
    nrm = R[:, :, 2]

    pg = pair_gauss
    # ONE fused (B, C) gather: TPU gather cost is per-INDEX with channels
    # riding along, so 6 separate gathers (means/tu/tv/nrm/opa/shs) pay the
    # 2M-index walk 6x, and the narrow ones get their minor dim lane-padded
    # 3 -> 128 (42x HBM traffic; the (B, 16, 3) SH gather alone wastes
    # ~16 GB at B=2M). Concatenating per-GAUSSIAN first (P = 262k rows,
    # cheap) makes the pair expansion a single 61-channel gather — only
    # 61 -> 128 lane padding (2.1x) — then one (B, C) -> (C, B) transpose
    # lands the kernel layout. scripts/profile_tracer.py measures the
    # alternatives: fused-six-gather 490 ms, per-component (B,) gathers
    # 62 GB OOM (each pads to (B, 128)).
    sh_flat = shs[:, :n_sh, :].transpose(0, 2, 1).reshape(P, 3 * n_sh)
    g_all = jnp.concatenate(
        [means3d, tu_s, tv_s, nrm, opacities[:, None], sh_flat], axis=1
    )  # (P, 13 + 3*n_sh)
    payload = g_all[pg]  # (B, 13 + 3*n_sh)
    payload = jnp.where(pair_valid[:, None], payload, 0.0).T  # (C, B)
    if payload.shape[0] < C_PAY:
        payload = jnp.concatenate(
            [payload, jnp.zeros((C_PAY - payload.shape[0], B), payload.dtype)],
            axis=0,
        )
    payload = jnp.concatenate(
        [payload, jnp.zeros((C_PAY, K_CHUNK), payload.dtype)], axis=1
    )

    rays8 = jnp.concatenate([ro, rd, jnp.zeros((NB, NRAY, 2))], axis=-1)
    out = _trace_core(
        config.tmin, config.interpret, config.exact_order, n_sh,
        payload, rays8, seg.seg_start, seg.seg_count,
    )

    rgb = out[..., pk.OUT_RGB : pk.OUT_RGB + 3].reshape(N, 3)
    depth = out[..., pk.OUT_DEPTH].reshape(N)
    normal = out[..., pk.OUT_NORMAL : pk.OUT_NORMAL + 3].reshape(N, 3)
    final_T = out[..., pk.OUT_FINAL_T].reshape(N)
    return {
        "rgb": rgb,
        "depth": depth,
        "normal": normal,
        "acc": 1.0 - final_T,
        "final_T": final_T,
        "overflow": seg.overflow + cluster_overflow,
        # Actual pair demand (pre-truncation): overflow == 0 is ambiguous
        # between "budget fits" and "nothing to trace" (the round-4 flagship
        # env-cloud death read as overflow -> 0); demand disambiguates and
        # is the trainer's liveness signal for the traced stage.
        "pairs": jnp.sum(okg.astype(jnp.int32)),
    }
