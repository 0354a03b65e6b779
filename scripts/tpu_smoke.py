"""Quick on-TPU smoke test of the Pallas forward kernel vs the jnp reference."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from materialrefgs_tpu.cameras import look_at_camera
from materialrefgs_tpu.ops.rasterize.api import RasterizeConfig, rasterize
from materialrefgs_tpu.ops.rasterize.reference import rasterize_reference


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    cam = look_at_camera(
        eye=np.array([0.0, 0.0, -4.0]),
        target=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]),
        fovx=0.9,
        fovy=0.7,
        width=64,
        height=48,
    )
    P = 256
    means = jnp.asarray(rng.normal(size=(P, 3)) * 0.6, jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(P, 2)) * 0.5 - 1.6), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(P, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.2, 0.95, size=(P,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(P, 3)), jnp.float32)
    feats = jnp.asarray(rng.uniform(size=(P, 6)), jnp.float32)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)

    cfg = RasterizeConfig(pair_capacity=1 << 14, interpret=False)
    t0 = time.time()
    out = rasterize(means, scales, rots, opac, colors, feats, cam, bg, config=cfg)
    jax.block_until_ready(out["render"])
    print(f"compile+run: {time.time()-t0:.1f}s")

    ref = rasterize_reference(means, scales, rots, opac, colors, feats, cam, bg)
    for key in ["render", "feature", "normal", "depth", "alpha", "distortion", "median_depth"]:
        a, b = np.asarray(out[key]), np.asarray(ref[key])
        err = np.max(np.abs(a - b))
        print(f"{key:14s} max_abs_err = {err:.3e}")
        assert err < 5e-3, key
    print("TPU forward parity OK")


if __name__ == "__main__":
    main()
