"""materialrefgs_tpu — TPU-native reflective 2D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wen-yuan-zhang/MaterialRefGS (NeurIPS 2025, arXiv 2510.11387): 2D Gaussian
surfel rasterization with per-Gaussian PBR materials, a trainable cubemap
environment light with split-sum BRDF shading, splat-traced visibility and
indirect light, and multi-view-consistent material supervision — all built
TPU-first (static shapes, Pallas tile kernels, shard_map scale-out).
"""

__version__ = "0.1.0"
