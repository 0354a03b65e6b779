"""materialrefgs_tpu — TPU-native reflective 2D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wen-yuan-zhang/MaterialRefGS (NeurIPS 2025, arXiv 2510.11387): 2D Gaussian
surfel rasterization with per-Gaussian PBR materials, a trainable cubemap
environment light with split-sum BRDF shading, splat-traced visibility and
indirect light, and multi-view-consistent material supervision — all built
TPU-first (static shapes, Pallas tile kernels, shard_map scale-out).
"""

__version__ = "0.1.0"


# Persistent XLA compilation cache: compiles on this platform go through a
# remote service with highly variable latency; caching them on disk makes
# every process after the first start fast. Opt out with
# MATERIALREFGS_NO_COMPCACHE=1.
import os as _os

if not _os.environ.get("MATERIALREFGS_NO_COMPCACHE"):
    try:
        import jax as _jax

        _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

# TPU matmuls/convs default to bf16 inputs; graphics math here (projection
# chains, moment/variance convolutions) cancels catastrophically at bf16 —
# measured: SSIM returning 9.4 inside the train step poisoned round-1
# training. f32 everywhere by default; the Pallas kernels and any hot path
# that can tolerate lower precision opt in explicitly per-op.
try:
    import jax as _jax2

    _jax2.config.update("jax_default_matmul_precision", "highest")
except Exception:
    pass
