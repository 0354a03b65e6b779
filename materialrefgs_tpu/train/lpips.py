"""LPIPS perceptual distance (reference lpipsPyTorch/modules/lpips.py:1-55,
networks.py) in pure JAX: VGG16 features, channel-unit-normalized, squared
difference, learned per-channel 1x1 weights, spatial mean, summed over the
five tap layers (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).

Weights policy (this environment has no network access and no pretrained
VGG anywhere on disk): LPIPS silently returning garbage from random weights
would be worse than absent, so every entry point demands a weight file and
raises with instructions when it is missing. Conversion from the standard
torchvision VGG16 checkpoint + lpips 'vgg.pth' linear heads into our .npz
is `scripts/convert_lpips_weights.py`.

Weight file format (.npz):
  conv{i}_w  (kh, kw, Cin, Cout) f32   i in 0..12   VGG16 conv stack (HWIO)
  conv{i}_b  (Cout,)
  lin{j}     (C_j,) f32                j in 0..4    nonneg LPIPS heads
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WEIGHTS_ENV = "MATERIALREFGS_LPIPS_WEIGHTS"
# VGG16 conv plan: channels per conv layer and pool positions.
_VGG_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_POOL_AFTER = {1, 3, 6, 9}  # maxpool after these conv indices (0-based)
_TAPS = {1: 0, 3: 1, 6: 2, 9: 3, 12: 4}  # conv idx -> lpips head idx

# ImageNet normalization in the lpips 'scaling layer' convention
# (lpipsPyTorch networks.py ScalingLayer: inputs in [-1, 1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_path() -> str:
    return os.environ.get(
        DEFAULT_WEIGHTS_ENV,
        os.path.join(os.path.dirname(__file__), "..", "..", "assets", "lpips_vgg.npz"),
    )


def weights_available(path: str | None = None) -> bool:
    return os.path.exists(path or default_weights_path())


class LpipsWeightsMissing(FileNotFoundError):
    pass


def load_weights(path: str | None = None) -> dict:
    path = path or default_weights_path()
    if not os.path.exists(path):
        raise LpipsWeightsMissing(
            f"LPIPS weights not found at {path}. This environment cannot "
            "download pretrained VGG16; obtain torchvision's vgg16 checkpoint "
            "and the lpips package's 'vgg.pth' linear heads, then run "
            "scripts/convert_lpips_weights.py to produce the .npz (or set "
            f"${DEFAULT_WEIGHTS_ENV}). Refusing to compute LPIPS from "
            "uninitialized weights."
        )
    raw = np.load(path)
    w = {k: jnp.asarray(raw[k]) for k in raw.files}
    for i, c in enumerate(_VGG_CHANNELS):
        if f"conv{i}_w" not in w or w[f"conv{i}_w"].shape[-1] != c:
            raise ValueError(f"LPIPS weight file malformed at conv{i} ({path})")
    return w


def _vgg_features(x, w):
    """x (H, W, 3) in [0, 1] -> list of 5 tap feature maps (H_i, W_i, C_i)."""
    # to [-1, 1], then the lpips scaling layer.
    x = x * 2.0 - 1.0
    x = (x - _SHIFT) / _SCALE
    x = x[None]  # NHWC
    taps = [None] * 5
    for i in range(len(_VGG_CHANNELS)):
        x = jax.lax.conv_general_dilated(
            x,
            w[f"conv{i}_w"],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + w[f"conv{i}_b"]
        x = jax.nn.relu(x)
        if i in _TAPS:
            taps[_TAPS[i]] = x[0]
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return taps


def _unit_normalize(f, eps=1e-10):
    n = jnp.sqrt(jnp.maximum(jnp.sum(f * f, axis=-1, keepdims=True), eps * eps))
    return f / n


def lpips(img1, img2, weights: dict):
    """Perceptual distance between (H, W, 3) images in [0, 1]."""
    f1 = _vgg_features(img1, weights)
    f2 = _vgg_features(img2, weights)
    total = 0.0
    for j, (a, b) in enumerate(zip(f1, f2)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        lin = jnp.maximum(weights[f"lin{j}"], 0.0)  # lpips constrains >= 0
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
    return total


def make_lpips_fn(path: str | None = None):
    """Returns a jitted (img1, img2) -> scalar; raises LpipsWeightsMissing."""
    w = load_weights(path)
    return jax.jit(functools.partial(lpips, weights=w))
