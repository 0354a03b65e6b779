"""Microbenchmark the bundle splat tracer on the real chip.

Separates the surfel2 trace cost (profile_surfel2.py: ~1.0 s/it list-order,
~2.0 s/it exact at a 2M pair budget) into:
  - binning (stage 1/2 cone cull + segment build + payload gather)
  - forward kernel walk
  - forward+backward
for list vs exact order, at a configurable pair budget. The scene mimics a
converged object (shell of surfels) with reflected-ray-like bundles so the
per-bundle pair lists saturate the budget, matching the surfel2 onset.

Usage: python scripts/profile_tracer.py [--pair_capacity 2097152]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair_capacity", type=int, default=1 << 21)
    ap.add_argument("--n_bundles", type=int, default=625)  # 400^2 tiles
    ap.add_argument("--P", type=int, default=262144)
    ap.add_argument("--alive", type=int, default=55000)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from materialrefgs_tpu.ops.tracer import api as tapi
    from materialrefgs_tpu.ops.tracer.api import TracerConfig, trace

    rng = np.random.default_rng(0)
    P, A = args.P, args.alive
    # Shell of surfels (converged-object stand-in); dead padding beyond A.
    u = rng.normal(size=(A, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    means = np.zeros((P, 3), np.float32)
    means[:A] = (u * (1.0 + 0.05 * rng.standard_normal((A, 1)))).astype(np.float32)
    scales = np.full((P, 2), 1e-6, np.float32)
    scales[:A] = np.exp(rng.normal(size=(A, 2)) * 0.3 - 3.6)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = np.zeros((P,), np.float32)
    opac[:A] = rng.uniform(0.3, 0.95, A)
    shs = np.zeros((P, 16, 3), np.float32)
    shs[:A] = 0.2 * rng.standard_normal((A, 16, 3))

    # Reflected-ray-like bundles: origins on the shell, directions outward
    # with tile-coherent jitter (matching surfel2's reflected coherence).
    NB = args.n_bundles
    N = NB * 256
    bo = rng.normal(size=(NB, 3))
    bo /= np.linalg.norm(bo, axis=-1, keepdims=True)
    o = np.repeat(bo, 256, 0) * 1.02
    d = np.repeat(bo, 256, 0) + 0.15 * rng.standard_normal((N, 3)) / 16.0
    # Half the bundles graze the shell tangentially (long pair lists).
    graze = np.repeat(rng.random(NB) < 0.5, 256)
    tang = np.cross(o, rng.standard_normal((N, 3)))
    tang /= np.maximum(np.linalg.norm(tang, axis=-1, keepdims=True), 1e-9)
    d = np.where(graze[:, None], tang + 0.02 * d, d)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    jargs = tuple(jnp.asarray(x) for x in (o, d, means, scales, rots, opac, shs))

    for exact in (False, True):
        cfg = TracerConfig(
            pair_capacity=args.pair_capacity,
            cluster_pair_capacity=args.pair_capacity >> 7,
            exact_order=exact,
        )

        fwd = jax.jit(lambda *a: trace(*a, config=cfg)["rgb"])

        def loss(ro, rd, m, s, r, op, sh):
            out = trace(ro, rd, m, s, r, op, sh, config=cfg)
            return (jnp.sum(out["rgb"] ** 2) + jnp.sum(out["acc"])
                    + jnp.sum(out["depth"] * 1e-3))

        gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 5, 6)))

        ovf = int(trace(*jargs, config=cfg)["overflow"])
        t_f = timeit(fwd, *jargs, iters=args.iters)
        t_g = timeit(gr, *jargs, iters=args.iters)
        n_chunks = args.pair_capacity // 128
        print(f"[{'exact' if exact else 'list '}] overflow {ovf/1e6:6.2f}M  "
              f"fwd {t_f:7.1f} ms  fwd+bwd {t_g:7.1f} ms  "
              f"({t_f/n_chunks*1e3:.1f} / {t_g/n_chunks*1e3:.1f} us/chunk)",
              flush=True)

    # Binning alone: segment build + payload path without the kernel.
    cfg = TracerConfig(pair_capacity=args.pair_capacity,
                       cluster_pair_capacity=args.pair_capacity >> 7)

    def binning_only(ro, rd, m, s, r, op, sh):
        # Everything in trace() before _trace_core, summarised by the
        # payload checksum (keeps XLA from DCE-ing the build).
        import materialrefgs_tpu.ops.tracer.api as t

        N = ro.shape[0]
        NB = N // t.NRAY
        ro_b = ro.reshape(NB, t.NRAY, 3)
        rd_b = rd.reshape(NB, t.NRAY, 3)
        o_c, d_c, r0, tant = t._bundle_stats(ro_b, rd_b)
        alive = op >= (1.0 / 255.0)
        prep = t._cluster_gaussians(m, s, alive)
        G = prep.centers.shape[0]
        ok_bc, _ = t._cone_test(
            prep.centers[None], prep.radii[None], o_c[:, None], d_c[:, None],
            r0[:, None], tant[:, None], cfg.tmin)
        ok_bc = ok_bc & prep.cluster_alive[None, :]
        flat_idx = jnp.nonzero(ok_bc.reshape(-1), size=cfg.cluster_pair_capacity,
                               fill_value=NB * G)[0]
        cp_b = jnp.minimum(flat_idx // G, NB - 1)
        cp_c = jnp.minimum(flat_idx % G, G - 1)
        cp_valid = flat_idx < NB * G
        lanes = jnp.arange(t.CLUSTER, dtype=jnp.int32)[None, :]
        gidx = cp_c[:, None] * t.CLUSTER + lanes
        gauss = prep.order[gidx]
        b_of = jnp.broadcast_to(cp_b[:, None], gauss.shape)
        px = m[:, 0][gauss]; py = m[:, 1][gauss]; pz = m[:, 2][gauss]
        r_g = (3.0 * jnp.max(s, axis=-1))[gauss]
        vx = px - o_c[cp_b, 0][:, None]
        vy = py - o_c[cp_b, 1][:, None]
        vz = pz - o_c[cp_b, 2][:, None]
        t_proj = (vx * d_c[cp_b, 0][:, None] + vy * d_c[cp_b, 1][:, None]
                  + vz * d_c[cp_b, 2][:, None])
        perp2 = jnp.maximum(vx * vx + vy * vy + vz * vz - t_proj * t_proj, 0.0)
        r0_b = r0[cp_b][:, None]
        lim = r0_b + r_g + jnp.maximum(t_proj, 0.0) * tant[cp_b][:, None]
        okg = (t_proj >= cfg.tmin - r0_b - r_g) & (perp2 <= lim * lim)
        okg = okg & cp_valid[:, None] & alive[gauss] & (gidx < m.shape[0])
        from materialrefgs_tpu.ops.segments import build_aligned_segments, scatter_pairs
        seg = build_aligned_segments(b_of.reshape(-1), t_proj.reshape(-1),
                                     okg.reshape(-1), NB, cfg.pair_capacity)
        B = cfg.pair_capacity
        pg = scatter_pairs(jnp.where(okg.reshape(-1), gauss.reshape(-1), 0),
                           seg.perm_pos, B)
        pv = scatter_pairs(okg.reshape(-1), seg.perm_pos, B, fill=False)
        from materialrefgs_tpu.utils.transforms import quat_to_rotmat
        R = quat_to_rotmat(r)
        tu_s = R[:, :, 0] / jnp.maximum(s[:, 0:1], 1e-12)
        tv_s = R[:, :, 1] / jnp.maximum(s[:, 1:2], 1e-12)
        nrm = R[:, :, 2]
        sh_flat = sh.transpose(0, 2, 1).reshape(m.shape[0], 48)
        g_all = jnp.concatenate(
            [m, tu_s, tv_s, nrm, op[:, None], sh_flat], axis=1)
        payload = g_all[pg]
        payload = jnp.where(pv[:, None], payload, 0.0).T
        return jnp.sum(payload[:, ::1024]) + seg.seg_start[-1]

    t_b = timeit(jax.jit(binning_only), *jargs, iters=args.iters)
    print(f"[binning] {t_b:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
