"""Trainable cubemap environment light (reference scene/light.py EnvLight).

State = logits cubemap (6, R, R, 3); every sample is passed through sigmoid
(scene/light.py:129). Mips are rebuilt from the logits each step
(train_refnerf.py:1156-1163) with the avg-pool + GGX prefilter chain.
Functional style: `EnvLightMips.build(params)` -> pytree used by queries.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from materialrefgs_tpu.ops import cubemap as cm


@struct.dataclass
class EnvLightParams:
    base: jax.Array  # (6, R, R, 3) logits

    @staticmethod
    def create(res: int = 128, init: float = 0.0) -> "EnvLightParams":
        return EnvLightParams(base=jnp.full((6, res, res, 3), init, jnp.float32))


@struct.dataclass
class EnvLightMips:
    specular: Sequence[jax.Array]  # tuple of (6, r, r, 3), r: R..min_res
    diffuse: jax.Array  # (6, min_res, min_res, 3)
    min_roughness: float = struct.field(pytree_node=False, default=0.08)
    max_roughness: float = struct.field(pytree_node=False, default=0.5)

    @staticmethod
    def build_jit(params: EnvLightParams, **kw) -> "EnvLightMips":
        """Jitted build — ALWAYS prefer this outside a surrounding jit: the
        eager prefilter dispatches dozens of large one-off TPU programs
        (~100s); jitted it fuses to milliseconds."""
        import functools

        return jax.jit(
            functools.partial(EnvLightMips.build, **kw)
        )(params)

    @staticmethod
    def build(
        params: EnvLightParams,
        min_res: int = 16,
        min_roughness: float = 0.08,
        max_roughness: float = 0.5,
        n_samples: int = 64,
    ) -> "EnvLightMips":
        spec, diff = cm.build_mip_chain(
            params.base,
            min_res=min_res,
            min_roughness=min_roughness,
            max_roughness=max_roughness,
            n_samples=n_samples,
        )
        return EnvLightMips(
            specular=tuple(spec),
            diffuse=diff,
            min_roughness=min_roughness,
            max_roughness=max_roughness,
        )

    def __call__(
        self,
        dirs: jax.Array,
        mode: str | None = None,
        roughness: jax.Array | None = None,
    ) -> jax.Array:
        """Query light; returns sigmoid-activated RGB (..., 3)."""
        if mode == "diffuse":
            light = cm.sample_cubemap(self.diffuse, dirs)
        elif mode == "pure_env":
            light = cm.sample_cubemap(self.specular[0], dirs)
        else:
            assert roughness is not None
            r = roughness[..., 0] if roughness.ndim == dirs.ndim else roughness
            mip = cm.get_mip(
                r, len(self.specular), self.min_roughness, self.max_roughness
            )
            light = cm.sample_mip_chain(list(self.specular), dirs, mip)
        return jax.nn.sigmoid(light)


def load_envlight_from_hdr(path: str, res: int = 128, scale: float = 1.0) -> EnvLightParams:
    """EnvLight.load (scene/light.py:46-70): HDR latlong -> srgb -> logits ->
    cubemap."""
    import imageio.v2 as imageio
    import numpy as np

    from materialrefgs_tpu.ops.cubemap import latlong_to_cubemap
    from materialrefgs_tpu.utils.transforms import inverse_sigmoid, linear_to_srgb

    hdr = np.asarray(imageio.imread(path), np.float32)
    if hdr.ndim == 2:
        hdr = hdr[..., None].repeat(3, -1)
    ldr = np.asarray(linear_to_srgb(jnp.asarray(np.clip(hdr[..., :3], 1e-4, 255.0))))
    img = jnp.clip(jnp.asarray(ldr) * scale, 0.001, 1 - 0.001)
    logits = inverse_sigmoid(img)
    cube = latlong_to_cubemap(logits, res)
    return EnvLightParams(base=cube)
