"""TPU drive: tracer exact-order fwd+bwd + per-ray SH vs jnp reference."""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())
import dataclasses
from materialrefgs_tpu.ops.tracer.api import TracerConfig, trace
from materialrefgs_tpu.ops.tracer.reference import trace_reference
from materialrefgs_tpu.utils import sh as sh_utils

rng = np.random.default_rng(42)
P = 512
u = rng.normal(size=(P, 3)); u /= np.linalg.norm(u, axis=-1, keepdims=True)
means = (u * (1.0 + 0.05 * rng.standard_normal((P, 1)))).astype(np.float32)
scales = np.exp(rng.normal(size=(P, 2)) * 0.3 - 2.6).astype(np.float32)
rots = rng.normal(size=(P, 4)).astype(np.float32)
opac = rng.uniform(0.4, 0.95, size=(P,)).astype(np.float32)
shs = np.zeros((P, 16, 3), np.float32)
shs[:, 0, :] = sh_utils.rgb_to_sh(rng.uniform(0.3, 0.7, (P, 3)).astype(np.float32))
shs[:, 1:, :] = 0.15 * rng.standard_normal((P, 15, 3)).astype(np.float32)

N = 4 * 256
o = np.zeros((N, 3), np.float32)
o[:, :2] = rng.uniform(-0.3, 0.3, (N, 2)); o[:, 2] = -3.0
d = np.concatenate([rng.uniform(-0.15, 0.15, (N, 2)), np.ones((N, 1))], -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
args = tuple(jnp.asarray(a) for a in (means, scales, rots, opac, shs))
ro, rd = jnp.asarray(o), jnp.asarray(d)

cfg = TracerConfig(pair_capacity=1 << 15, cluster_pair_capacity=1 << 11,
                   interpret=False, exact_order=True)

def loss(means, opac, shs, ro, rd, c):
    out = trace(ro, rd, means, args[1], args[2], opac, shs, c)
    return (jnp.sum(out["rgb"] * 1.3) + jnp.sum(out["depth"]) * 0.1
            + jnp.sum(out["normal"] * 0.3) + jnp.sum(out["acc"]) * 0.5)

f = jax.jit(jax.value_and_grad(
    lambda m, op, s: loss(m, op, s, ro, rd, cfg), argnums=(0, 1, 2)))
t0 = time.time()
v, g = f(args[0], args[3], args[4])
jax.block_until_ready(g)
print(f"exact fwd+bwd compile+run: {time.time()-t0:.1f}s loss={float(v):.4f}")
t0 = time.time()
for _ in range(10):
    v, g = f(args[0], args[3], args[4])
jax.block_until_ready(g)
dt = (time.time() - t0) / 10
print(f"exact fwd+bwd steady: {dt*1e3:.1f} ms (1024 rays, P=512)")

# reference grads
def ref_loss(m, op, s):
    out = trace_reference(ro, rd, m, args[1], args[2], op, None, shs=s, sh_degree=3)
    return (jnp.sum(out["rgb"] * 1.3) + jnp.sum(out["depth"]) * 0.1
            + jnp.sum(out["normal"] * 0.3) + jnp.sum(out["acc"]) * 0.5)
vr, gr = jax.jit(jax.value_and_grad(ref_loss, argnums=(0, 1, 2)))(args[0], args[3], args[4])
print(f"ref loss={float(vr):.4f}  dloss={abs(float(v-vr)):.2e}")
for n, a, b in zip(["means", "opac", "shs"], g, gr):
    a, b = np.asarray(a), np.asarray(b)
    sc = max(np.abs(b).max(), 1e-3)
    bad = float(np.mean(np.abs(a - b) > 1e-2 * sc + 1e-4))
    print(f"  grad {n}: frac_bad={bad:.4f} max_abs_diff={np.abs(a-b).max():.2e} scale={sc:.2e}")
    assert bad < 0.05, n
    assert np.all(np.isfinite(a))

# list-order timing for comparison
cfg2 = dataclasses.replace(cfg, exact_order=False)
f2 = jax.jit(jax.value_and_grad(
    lambda m, op, s: loss(m, op, s, ro, rd, cfg2), argnums=(0, 1, 2)))
v2, g2 = f2(args[0], args[3], args[4]); jax.block_until_ready(g2)
t0 = time.time()
for _ in range(10):
    v2, g2 = f2(args[0], args[3], args[4])
jax.block_until_ready(g2)
print(f"list-order fwd+bwd steady: {(time.time()-t0)/10*1e3:.1f} ms")
print("TPU VERIFY OK")
