"""Decompose the rasterizer BACKWARD cost on the real chip (bench workload).

Times, each jitted in isolation:
  - bwd Pallas kernel alone
  - chunk-major -> per-gaussian scatter-add reduction alone
  - full _render_pairs VJP (kernel + scatter)
  - everything-else VJP (preprocess/payload/permute chains)
Prints a JSON dict of milliseconds.
"""
import json
import os
import sys
import time

import numpy as np


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_scene
    from materialrefgs_tpu.cameras import look_at_camera
    from materialrefgs_tpu.ops.rasterize import binning
    from materialrefgs_tpu.ops.rasterize.api import (
        RasterizeConfig,
        _build_payload,
        _gather_pairs,
        _render_pairs,
        rasterize,
    )
    from materialrefgs_tpu.ops.rasterize.layout import (
        K_CHUNK,
        TILE,
        out_channels_padded,
        out_layout,
        payload_channels_padded,
        row_gid,
    )
    from materialrefgs_tpu.ops.rasterize.pallas_bwd import rasterize_tiles_bwd
    from materialrefgs_tpu.ops.rasterize.preprocess import preprocess

    W = H = 800
    cam = look_at_camera(
        np.array([0.0, 0.0, -3.2]), np.zeros(3), np.array([0.0, 1.0, 0.0]),
        0.8, 0.8, W, H,
    )
    means, scales, rots, opac, colors, feats = build_scene()
    cfg = RasterizeConfig(pair_capacity=(1 << 20) + (1 << 18))
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    S = feats.shape[-1]
    res = {}

    def prep(m, s, r, o):
        pre = preprocess(m, s, r, cam, 1.0)
        active = o >= (1.0 / 255.0)
        valid = pre.valid & active
        pre = pre._replace(
            valid=valid,
            tiles_touched=jnp.where(valid, pre.tiles_touched, 0),
            radius=jnp.where(valid, pre.radius, 0.0),
        )
        order = jnp.argsort(pre.depth, stable=True)
        pre_s = jax.tree_util.tree_map(lambda a: a[order], pre)
        # opacities => post-cull pair list, matching production binning
        # (api.py / tile_sharding.py) so per-stage timings attribute the
        # same pair count as fwd_bwd_ms.
        bins = binning.bin_pairs(
            pre_s, grid_x, grid_y, cfg.pair_capacity, opacities=o[order]
        )
        return pre_s, bins, order

    pre_s, bins, order = jax.jit(prep)(means, scales, rots, opac)
    payload_g = jax.jit(
        lambda pre_s, o, c, f: _build_payload(pre_s, o[order], c[order], f[order], S)
    )(pre_s, opac, colors, feats)

    fwd_full = jax.jit(
        lambda pg, bins: _render_pairs(S, grid_x, grid_y, W, H, False, pg, bins)
    )
    tiles_out = fwd_full(payload_g, bins)
    cot = jnp.ones_like(tiles_out)

    pp = jax.jit(_gather_pairs)(payload_g, bins)
    lay = out_layout(S)
    n_contrib = tiles_out[..., lay["n_contrib"][0]]
    tile_active = jnp.max(n_contrib, axis=1).astype(jnp.int32)

    bwd_kernel = jax.jit(
        lambda pp, bins, tile_active, tiles_out, cot: rasterize_tiles_bwd(
            pp, bins.tile_start, bins.tile_count, tile_active, bins.chunk_base,
            tiles_out, cot, S=S, grid_x=grid_x, grid_y=grid_y, W=W, H=H,
        )
    )
    res["bwd_kernel_ms"] = timeit(bwd_kernel, pp, bins, tile_active, tiles_out, cot)
    d_ch = bwd_kernel(pp, bins, tile_active, tiles_out, cot)
    res["d_ch_shape"] = list(d_ch.shape)
    res["d_ch_mb"] = round(d_ch.size * 4 / 1e6, 1)

    GID = row_gid(S)
    P = payload_g.shape[1]

    def scatter_reduce(d_ch, bins):
        col = jnp.arange(d_ch.shape[1], dtype=jnp.int32)
        live = col < bins.chunk_base[-1] * K_CHUNK
        raw = d_ch[GID].astype(jnp.int32) - 1
        idx = jnp.where(live & (raw >= 0), raw, P)
        dpg = jnp.zeros((d_ch.shape[0], P), d_ch.dtype).at[:, idx].add(
            d_ch, mode="drop"
        )
        return dpg.at[GID].set(0.0)

    res["scatter_reduce_ms"] = timeit(jax.jit(scatter_reduce), d_ch, bins)

    # Full custom VJP of _render_pairs (gather + kernel + scatter).
    def rp_vjp(pg, bins, cot):
        _, f_vjp = jax.vjp(
            lambda pg: _render_pairs(S, grid_x, grid_y, W, H, False, pg, bins), pg
        )
        return f_vjp(cot)

    res["render_pairs_vjp_ms"] = timeit(jax.jit(rp_vjp), payload_g, bins, cot)

    # Whole-rasterize fwd+bwd for reference.
    bg = jnp.zeros(3)

    def loss_fn(*a):
        out = rasterize(*a, camera=cam, bg_color=bg, config=cfg)
        return (
            jnp.mean((out["render"] - 0.5) ** 2)
            + 0.01 * jnp.mean(out["distortion"])
            + 0.01 * jnp.mean(jnp.abs(out["normal"]))
            + 0.01 * jnp.mean(out["depth"])
        )

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))
    res["fwd_bwd_ms"] = timeit(step, means, scales, rots, opac, colors, feats)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()}))


if __name__ == "__main__":
    main()
