"""Benchmark: rasterizer forward+backward throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: Shiny-Blender-like synthetic scene (shell of 2D surfels), 800x800
render with the full deferred feature set (S=9), measuring end-to-end
rasterize forward + gradient steps/s -> rays/s (= H*W*steps/s). The reference
publishes no numbers (BASELINE.md), so vs_baseline is FIXED against the
round-1 recorded result (4.08M rays/s, BASELINE.md "Round-1 measured
results") — an absolute anchor, not a self-referential ratchet.
"""
import json
import os
import time

import numpy as np


def build_scene(P=150_000, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    # Points on a bumpy sphere shell (approximates a converged object scene).
    u = rng.normal(size=(P, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    r = 1.0 + 0.1 * rng.standard_normal(P)[:, None]
    means = (u * r).astype(np.float32)
    scales = np.exp(rng.normal(size=(P, 2)) * 0.3 - 4.2).astype(np.float32)
    rots = rng.normal(size=(P, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(P,)).astype(np.float32)
    colors = rng.uniform(size=(P, 3)).astype(np.float32)
    feats = rng.uniform(size=(P, 9)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (means, scales, rots, opac, colors, feats))


def main():
    import jax
    import jax.numpy as jnp

    from materialrefgs_tpu.cameras import look_at_camera
    from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig, rasterize

    W = H = 800
    cam = look_at_camera(
        np.array([0.0, 0.0, -3.2]),
        np.zeros(3),
        np.array([0.0, 1.0, 0.0]),
        0.8,
        0.8,
        W,
        H,
    )
    args = build_scene()
    # 1.31M pairs: the scene produces ~1.21M (gaussian, tile) pairs; the
    # over-read layout needs no per-tile padding, so capacity tracks the
    # real pair count (the CUDA reference likewise sizes buffers exactly).
    cfg = RasterizeConfig(pair_capacity=(1 << 20) + (1 << 18))
    bg = jnp.zeros(3, jnp.float32)

    def loss_fn(*a):
        out = rasterize(*a, camera=cam, bg_color=bg, config=cfg)
        return (
            jnp.mean((out["render"] - 0.5) ** 2)
            + 0.01 * jnp.mean(out["distortion"])
            + 0.01 * jnp.mean(jnp.abs(out["normal"]))
            + 0.01 * jnp.mean(out["depth"])
        )

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))

    # Warmup / compile — and guard the headline number: a nonzero binning
    # overflow would mean dropped pairs (less work, inflated rays/s).
    ovf = int(rasterize(*args, camera=cam, bg_color=bg, config=cfg)["overflow"])
    assert ovf == 0, f"bench scene overflows pair capacity by {ovf}"
    g = step(*args)
    jax.block_until_ready(g)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*args)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    rays_per_s = W * H * iters / dt

    # Fixed round-1 anchor (BASELINE.md): 4.08M rays/s fwd+bwd on this
    # exact workload, TPU v5 lite single chip.
    R1_BASELINE = 4.08e6
    vs = rays_per_s / R1_BASELINE

    hist_path = os.path.join(os.path.dirname(__file__), "bench_history.json")
    try:
        hist = []
        if os.path.exists(hist_path):
            old = json.load(open(hist_path))
            hist = old if isinstance(old, list) else [old]
        hist.append({"ts": time.time(), "rays_per_s": rays_per_s})
        json.dump(hist, open(hist_path, "w"))
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "rays_per_s_fwd_bwd_800x800_150k",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
