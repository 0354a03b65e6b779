"""Stage-by-stage rasterizer timing on the real chip (bench workload).

Times each pipeline stage in isolation (jitted, block_until_ready):
preprocess, binning, payload build+gather, forward kernel, full forward,
full forward+backward — so optimization effort goes at the measured
bottleneck instead of a guess. Prints a JSON dict of milliseconds.
"""
import json
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

    sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
    from bench import build_scene
    from materialrefgs_tpu.cameras import look_at_camera
    from materialrefgs_tpu.ops.rasterize import binning
    from materialrefgs_tpu.ops.rasterize.api import (
        RasterizeConfig,
        _build_payload,
        _render_pairs,
        rasterize,
    )
    from materialrefgs_tpu.ops.rasterize.layout import TILE
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
    bg = jnp.zeros(3)
    res = {}

    pre_fn = jax.jit(lambda m, s, r: preprocess(m, s, r, cam, 1.0))
    res["preprocess_ms"] = timeit(pre_fn, means, scales, rots)
    pre = pre_fn(means, scales, rots)

    def sort_and_bin(pre, opacities):
        active = opacities >= (1.0 / 255.0)
        valid = pre.valid & active
        pre = pre._replace(
            valid=valid,
            tiles_touched=jnp.where(valid, pre.tiles_touched, 0),
            radius=jnp.where(valid, pre.radius, 0.0),
        )
        order = jnp.argsort(pre.depth, stable=True)
        pre_s = jax.tree_util.tree_map(lambda a: a[order], pre)
        return binning.bin_pairs(pre_s, grid_x, grid_y, cfg.pair_capacity), pre_s, order

    bin_fn = jax.jit(sort_and_bin)
    res["sort_bin_ms"] = timeit(bin_fn, pre, opac)
    bins, pre_s, order = bin_fn(pre, opac)

    pay_fn = jax.jit(
        lambda pre_s, o, c, f, order: _build_payload(
            pre_s, o[order], c[order], f[order], S
        )
    )
    res["payload_ms"] = timeit(pay_fn, pre_s, opac, colors, feats, order)
    payload = pay_fn(pre_s, opac, colors, feats, order)

    fwd = jax.jit(
        lambda payload, bins: _render_pairs(
            S, grid_x, grid_y, W, H, False, payload, bins
        )
    )
    res["gather_plus_fwd_kernel_ms"] = timeit(fwd, payload, bins)

    full_fwd = jax.jit(
        lambda *a: rasterize(*a, camera=cam, bg_color=bg, config=cfg)["render"]
    )
    res["full_forward_ms"] = timeit(full_fwd, means, scales, rots, opac, colors, feats)

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
    res["rays_per_s"] = W * H / (res["fwd_bwd_ms"] / 1e3)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
