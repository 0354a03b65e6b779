"""Pallas TPU kernels for the bundle splat tracer (fwd + bwd).

TPU-native replacement for the OptiX surfel tracer (EnvGS /
diff_surfel_tracing, wrapped by gaussian_renderer/optix_utils.py): instead of
per-ray BVH traversal, rays are grouped into coherent bundles of 256 (pixel
tiles of the reflected-ray map), gaussians are cone-culled and depth-ordered
per bundle (see api.py), and each bundle composites its sorted pair list in
K=128 chunks like the tile rasterizer — log-transmittance prefix via
triangular MXU matmuls, collective early exit.

Per (ray, gaussian) math: ray-plane intersection t = <p - o, n>/<d, n>, splat
coords u = <q, tu/su>, v = <q, tv/sv>, rho = u^2 + v^2 with 3-sigma cutoff,
alpha = min(0.99, opa * exp(-rho/2)) — the same alpha law as the rasterizer.

Color is PER-RAY spherical harmonics, evaluated in-kernel: the payload
carries raw SH coefficients (channel-major rows) and each chunk computes
color = max(Y(dir) @ sh + 0.5, 0) with the ray's own unit direction — the
reference OptiX tracer's per-ray SH contract
(gaussian_renderer/optix_utils.py:84-271), not a bundle-mean approximation.
The backward chains gradients to the SH coefficients AND to the ray
direction through the analytic SH basis Jacobian.

Two compositing orders (static `exact_order` switch):
- list order (default-off fast path): all 256 rays composite the bundle's
  depth-sorted pair list in list order — one shared triangular matmul.
- exact order: each ray composites in ITS OWN hit-t order within every
  chunk (per-ray comparator matmuls; cross-chunk stream stays center-depth
  chunked). Forward AND backward — training gradients match the exact
  per-ray compositing used at eval.

The backward walks chunks in reverse. In list order it reconstructs T from
the saved final_T; in exact order it reconstructs each ray's prefix
transmittance from the saved total log-T (OUT_SUMLG) minus a per-ray
suffix, and re-derives the T-stop inclusion mask — bitwise-consistent with
the forward up to f32 rounding at the stop boundary (where weights are
<= 1e-4 by construction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from materialrefgs_tpu.ops.rasterize.layout import K_CHUNK, LOG_T_STOP
from materialrefgs_tpu.utils.sh import C0, C1, C2, C3

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
RHO_CUTOFF = 9.0
NRAY = 256  # rays per bundle
SLAB = 64  # rays per comparator-matmul slab (exact_order). Mosaic keeps all
# NRAY/SLAB unrolled (SLAB,K,K) masks live on the vector stack (~16M), so
# exact-order pallas_calls raise vmem_limit_bytes (v5e has 128M physical).
VMEM_LIMIT_EXACT = 40 * 1024 * 1024

# Payload rows (geometry block; SH rows follow from ROW_SH)
ROW_P = 0  # 0:3 center
ROW_TU = 3  # 3:6 tu / su
ROW_TV = 6  # 6:9 tv / sv
ROW_N = 9  # 9:12 unit normal
ROW_OPA = 12
ROW_SH = 13  # 13:13+3*n_sh raw SH coefficients, channel-major (c*n_sh + k)


def pay_rows(n_sh: int) -> int:
    """Padded payload row count for a given SH basis size."""
    return ((ROW_SH + 3 * n_sh + 7) // 8) * 8


# Forward output channels
OUT_RGB = 0  # 0:3
OUT_DEPTH = 3
OUT_NORMAL = 4  # 4:7
OUT_FINAL_T = 7
OUT_NCONTRIB = 8
OUT_SUMLG = 9  # per-ray total log-T over processed chunks (bwd residual)
OUT_NPROC = 10  # chunks processed before early exit (bwd walk bound)
C_OUT = 16  # padded

_DOT = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _tri(K, strict, suffix=False):
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    if suffix:
        cmp = (r > c) if strict else (r >= c)
    else:
        cmp = (r < c) if strict else (r <= c)
    return cmp.astype(jnp.float32)


def sh_basis(x, y, z, n_sh: int) -> list:
    """Real SH basis values (utils/sh.py conventions) on unit-dir components.

    Returns a list of n_sh arrays shaped like x. Supports n_sh in {1,4,9,16}.
    """
    one = jnp.ones_like(x)
    Y = [C0 * one]
    if n_sh >= 4:
        Y += [-C1 * y, C1 * z, -C1 * x]
    if n_sh >= 9:
        xx, yy, zz = x * x, y * y, z * z
        Y += [
            C2[0] * x * y,
            C2[1] * y * z,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * x * z,
            C2[4] * (xx - yy),
        ]
    if n_sh >= 16:
        Y += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * x * y * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    assert len(Y) == n_sh, (len(Y), n_sh)
    return Y


def sh_basis_grad(x, y, z, n_sh: int) -> list:
    """Analytic d(basis)/d(unit dir): list of (gx, gy, gz) triples."""
    zero = jnp.zeros_like(x)
    G = [(zero, zero, zero)]
    if n_sh >= 4:
        G += [(zero, -C1 * jnp.ones_like(x), zero),
              (zero, zero, C1 * jnp.ones_like(x)),
              (-C1 * jnp.ones_like(x), zero, zero)]
    if n_sh >= 9:
        xx, yy, zz = x * x, y * y, z * z
        G += [
            (C2[0] * y, C2[0] * x, zero),
            (zero, C2[1] * z, C2[1] * y),
            (-2.0 * C2[2] * x, -2.0 * C2[2] * y, 4.0 * C2[2] * z),
            (C2[3] * z, zero, C2[3] * x),
            (2.0 * C2[4] * x, -2.0 * C2[4] * y, zero),
        ]
    if n_sh >= 16:
        G += [
            (6.0 * C3[0] * x * y, C3[0] * (3.0 * xx - 3.0 * yy), zero),
            (C3[1] * y * z, C3[1] * x * z, C3[1] * x * y),
            (-2.0 * C3[2] * x * y, C3[2] * (4.0 * zz - xx - 3.0 * yy), 8.0 * C3[2] * y * z),
            (-6.0 * C3[3] * x * z, -6.0 * C3[3] * y * z, C3[3] * (6.0 * zz - 3.0 * xx - 3.0 * yy)),
            (C3[4] * (4.0 * zz - 3.0 * xx - yy), -2.0 * C3[4] * x * y, 8.0 * C3[4] * x * z),
            (2.0 * C3[5] * x * z, -2.0 * C3[5] * y * z, C3[5] * (xx - yy)),
            (C3[6] * (3.0 * xx - 3.0 * yy), -6.0 * C3[6] * x * y, zero),
        ]
    assert len(G) == n_sh
    return G


def _unit_dir(d):
    """d: 3-tuple of (NRAY,1) raw dir components -> unit comps + inv norm."""
    dx, dy, dz = d
    inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
    return dx * inv, dy * inv, dz * inv, inv


def _ray_sh(d, n_sh):
    """Per-ray SH basis matrix (NRAY, n_sh) + unit comps + inv norm."""
    xu, yu, zu, inv = _unit_dir(d)
    Y = sh_basis(xu, yu, zu, n_sh)
    return jnp.concatenate(Y, axis=1), (xu, yu, zu), inv


def _chunk_colors(pay, Ymat, n_sh):
    """Per-(ray, lane) clamped rgb: 3 x (NRAY, K) + raw (pre-clamp) values."""
    cols, raws = [], []
    for c in range(3):
        sh_c = pay[ROW_SH + c * n_sh : ROW_SH + (c + 1) * n_sh, :]  # (n_sh, K)
        raw = jax.lax.dot_general(Ymat, sh_c, (((1,), (0,)), ((), ())), **_DOT) + 0.5
        raws.append(raw)
        cols.append(jnp.maximum(raw, 0.0))
    return cols, raws


def _geom(pay, o, d, tmin):
    """Shared fwd/bwd per-(ray, lane) geometry. o,d: 3x(256,1); pay (C,K)."""
    px_, py_, pz_ = (pay[ROW_P + i, :][None, :] for i in range(3))
    tux, tuy, tuz = (pay[ROW_TU + i, :][None, :] for i in range(3))
    tvx, tvy, tvz = (pay[ROW_TV + i, :][None, :] for i in range(3))
    nx, ny, nz = (pay[ROW_N + i, :][None, :] for i in range(3))
    opa = pay[ROW_OPA, :][None, :]
    ox, oy, oz = o
    dx, dy, dz = d

    denom = dx * nx + dy * ny + dz * nz  # (256,K)
    den_ok = jnp.abs(denom) > 1e-9
    den_s = jnp.where(den_ok, denom, 1.0)
    pox = px_ - ox
    poy = py_ - oy
    poz = pz_ - oz
    t = (pox * nx + poy * ny + poz * nz) / den_s
    qx = ox + t * dx - px_
    qy = oy + t * dy - py_
    qz = oz + t * dz - pz_
    u = qx * tux + qy * tuy + qz * tuz
    v = qx * tvx + qy * tvy + qz * tvz
    rho = u * u + v * v
    G = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(ALPHA_MAX, opa * G)
    ok = den_ok & (t >= tmin) & (rho <= RHO_CUTOFF) & (alpha >= ALPHA_MIN)
    return dict(
        denom=denom, den_s=den_s, t=t, q=(qx, qy, qz), u=u, v=v, G=G,
        alpha=alpha, ok=ok, opa=opa,
        n=(nx, ny, nz), tu=(tux, tuy, tuz), tv=(tvx, tvy, tvz),
        po=(pox, poy, poz),
    )


def _after_mask(tk_slab, lane_after):
    """(SLAB,K,K) strict 'j composites after i on this ray' comparator.
    lane_after is the PRECOMPUTED static (1,K,K) list-order tie-break."""
    ti = tk_slab[:, :, None]
    tj = tk_slab[:, None, :]
    return ((tj > ti) | ((tj == ti) & lane_after)).astype(jnp.float32)


def _before_mask(tk_slab, lane_before):
    ti = tk_slab[:, :, None]
    tj = tk_slab[:, None, :]
    return ((tj < ti) | ((tj == ti) & lane_before)).astype(jnp.float32)


# Comparator matvec precision: Mosaic supports only DEFAULT (bf16, would
# round the f32 log-T values) and HIGHEST — keep HIGHEST.
_DOT_MASK = _DOT


def _slab_matvec(mask_fn, t_key, values, lane_cmp):
    """Per-ray comparator matvec: out[r, i] = sum_j mask(r,i,j) values[r, j]."""
    parts = []
    for r0 in range(0, NRAY, SLAB):
        m = mask_fn(t_key[r0 : r0 + SLAB], lane_cmp)
        parts.append(
            jax.lax.dot_general(
                m, values[r0 : r0 + SLAB], (((2,), (1,)), ((0,), (0,))),
                **_DOT_MASK,
            )
        )
    return jnp.concatenate(parts, axis=0)


def _fwd_kernel(
    seg_start_ref, seg_count_ref,
    payload_hbm, rays_ref,
    out_ref,
    chunk_vmem, sem,
    *, tmin: float, n_sh: int, exact_order: bool = False,
):
    K = K_CHUNK
    b = pl.program_id(0)
    start = seg_start_ref[b]
    count = seg_count_ref[b]
    n_chunks = (count + K - 1) // K

    o = tuple(rays_ref[0, :, i : i + 1] for i in range(3))  # (256,1) each
    d = tuple(rays_ref[0, :, 3 + i : 4 + i] for i in range(3))
    Ymat, _, _ = _ray_sh(d, n_sh)
    m_incl = _tri(K, strict=False)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 1)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 2)
    lane_before = lane_j < lane_i

    def body(carry):
        chunk_i, logT, rgb, dep, nrm, final_logT, n_contrib = carry
        off = pl.multiple_of(start + chunk_i * K, K)
        cp = pltpu.make_async_copy(payload_hbm.at[:, pl.ds(off, K)], chunk_vmem, sem)
        cp.start()
        cp.wait()
        pay = chunk_vmem[:]
        g = _geom(pay, o, d, tmin)
        lane_ok = (off + lane) < start + count
        ok = g["ok"] & lane_ok
        a = jnp.where(ok, g["alpha"], 0.0)

        lg = jnp.log1p(-a)
        if exact_order:
            # EXACT per-ray within-chunk ordering: prefix_i = sum_j lg_j
            # over contributors j whose hit t_j precedes t_i on THIS ray
            # (stable list-order tie-break) — a per-ray comparator matvec
            # instead of the shared list-order triangular matmul. Slabbed
            # over rays so the (rows, K, K) mask fits VMEM.
            t_key = jnp.where(ok, g["t"], jnp.inf)
            logT_excl = logT + _slab_matvec(_before_mask, t_key, lg, lane_before)
            logT_incl = logT_excl + lg
        else:
            logT_incl = logT + jax.lax.dot_general(lg, m_incl, (((1,), (0,)), ((), ())), **_DOT)
            logT_excl = logT_incl - lg
        included = logT_incl >= LOG_T_STOP
        w = a * jnp.exp(logT_excl) * included.astype(jnp.float32)

        flip = jnp.where(g["denom"] > 0, -1.0, 1.0)
        cols, _ = _chunk_colors(pay, Ymat, n_sh)
        rgb_add = jnp.concatenate(
            [jnp.sum(w * cols[c], axis=1, keepdims=True) for c in range(3)],
            axis=1,
        )
        rgb = rgb + rgb_add
        dep = dep + jnp.sum(w * g["t"], axis=1, keepdims=True)
        wf = w * flip
        nrm_add = jnp.stack(
            [jnp.sum(wf * g["n"][i], axis=1) for i in range(3)], axis=1
        )  # (256,3)
        nrm = nrm + nrm_add

        chunk_min = jnp.min(jnp.where(included, logT_incl, jnp.inf), axis=1, keepdims=True)
        final_logT = jnp.minimum(final_logT, chunk_min)
        idx1 = (chunk_i * K + lane + 1).astype(jnp.float32)
        n_contrib = jnp.maximum(
            n_contrib, jnp.max(jnp.where(w > 0, idx1, 0.0), axis=1, keepdims=True)
        )
        if exact_order:
            # Cross-chunk carry is the order-independent chunk total.
            logT = logT + jnp.sum(lg, axis=1, keepdims=True)
        else:
            logT = logT_incl[:, K - 1 : K]
        return (chunk_i + 1, logT, rgb, dep, nrm, final_logT, n_contrib)

    def cond(carry):
        return (carry[0] < n_chunks) & (jnp.max(carry[1]) >= LOG_T_STOP)

    z1 = jnp.zeros((NRAY, 1), jnp.float32)
    init = (
        jnp.int32(0), z1, jnp.zeros((NRAY, 3), jnp.float32), z1,
        jnp.zeros((NRAY, 3), jnp.float32), z1, z1,
    )
    nproc, sumlg, rgb, dep, nrm, final_logT, n_contrib = jax.lax.while_loop(
        cond, body, init
    )
    nproc_f = jnp.full((NRAY, 1), 1.0, jnp.float32) * nproc.astype(jnp.float32)
    outs = jnp.concatenate(
        [rgb, dep, nrm, jnp.exp(final_logT), n_contrib, sumlg, nproc_f], axis=1
    )
    pad = C_OUT - outs.shape[1]
    outs = jnp.concatenate([outs, jnp.zeros((NRAY, pad), jnp.float32)], axis=1)
    out_ref[0] = outs


def trace_bundles_fwd(
    payload: jax.Array,  # (pay_rows(n_sh), B + K)
    rays: jax.Array,  # (NB, 256, 8) [o(3), d(3), pad]
    seg_start: jax.Array,  # (NB+1,)
    seg_count: jax.Array,  # (NB,)
    n_sh: int = 16,
    tmin: float = 1e-3,
    interpret: bool = False,
    exact_order: bool = False,
) -> jax.Array:
    NB = rays.shape[0]
    C_PAY = pay_rows(n_sh)
    assert payload.shape[0] == C_PAY, (payload.shape, C_PAY)
    kernel = functools.partial(
        _fwd_kernel, tmin=tmin, n_sh=n_sh, exact_order=exact_order
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, NRAY, 8), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NRAY, C_OUT), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((C_PAY, K_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, NRAY, C_OUT), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_EXACT if exact_order else None
        ),
    )(seg_start, seg_count, payload, rays)


def _bwd_kernel(
    seg_start_ref, seg_count_ref, seg_active_ref,
    payload_hbm, rays_ref, fwd_ref, cot_ref,
    dpayload_hbm, drays_ref,
    chunk_vmem, grad_vmem, sem_in, sem_out,
    *, tmin: float, n_sh: int, exact_order: bool = False,
):
    K = K_CHUNK
    b = pl.program_id(0)
    start = seg_start_ref[b]
    count = seg_count_ref[b]
    active = seg_active_ref[b]
    n_chunks = (count + K - 1) // K
    active_chunks = (active + K - 1) // K

    o = tuple(rays_ref[0, :, i : i + 1] for i in range(3))
    d = tuple(rays_ref[0, :, 3 + i : 4 + i] for i in range(3))
    Ymat, d_unit, inv_norm = _ray_sh(d, n_sh)
    final_T = fwd_ref[0, :, OUT_FINAL_T : OUT_FINAL_T + 1]
    n_contrib = fwd_ref[0, :, OUT_NCONTRIB : OUT_NCONTRIB + 1]
    total_lg = fwd_ref[0, :, OUT_SUMLG : OUT_SUMLG + 1]
    logT_fin = jnp.log(jnp.maximum(final_T, 1e-30))
    dRGB = cot_ref[0, :, OUT_RGB : OUT_RGB + 3]
    dDep = cot_ref[0, :, OUT_DEPTH : OUT_DEPTH + 1]
    dNrm = cot_ref[0, :, OUT_NORMAL : OUT_NORMAL + 3]
    dTfin = cot_ref[0, :, OUT_FINAL_T : OUT_FINAL_T + 1]

    tril_i = _tri(K, strict=False, suffix=True)
    tril_s = _tri(K, strict=True, suffix=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 1)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 2)
    lane_after = lane_j > lane_i

    def body(it, carry):
        carry_gw, carry_lg, do_acc, dd_acc = carry
        chunk_i = n_chunks - 1 - it
        off = pl.multiple_of(start + chunk_i * K, K)
        is_active = chunk_i < active_chunks

        def compute(carry_gw, carry_lg, do_acc, dd_acc):
            cp = pltpu.make_async_copy(payload_hbm.at[:, pl.ds(off, K)], chunk_vmem, sem_in)
            cp.start()
            cp.wait()
            pay = chunk_vmem[:]
            g = _geom(pay, o, d, tmin)
            idx1 = (chunk_i * K + lane + 1).astype(jnp.float32)
            lane_ok = (off + lane) < start + count

            cols, raws = _chunk_colors(pay, Ymat, n_sh)

            if exact_order:
                ok = g["ok"] & lane_ok
                a = jnp.where(ok, g["alpha"], 0.0)
                lg = jnp.log1p(-a)
                t_key = jnp.where(ok, g["t"], jnp.inf)
                # Per-ray prefix transmittance from the saved total:
                # prefix_excl_i = total - (lg_i + strict-after suffix).
                suf_lg = carry_lg + _slab_matvec(_after_mask, t_key, lg, lane_after)
                prefix_excl = total_lg - suf_lg - lg
                logT_incl = prefix_excl + lg
                included = logT_incl >= LOG_T_STOP
                T_i = jnp.exp(jnp.minimum(prefix_excl, 0.0))
                w = a * T_i * included.astype(jnp.float32)
                okf = (ok & included).astype(jnp.float32)
            else:
                within = idx1 <= n_contrib
                ok = g["ok"] & lane_ok & within
                a = jnp.where(ok, g["alpha"], 0.0)
                lg = jnp.log1p(-a)
                suf_incl = carry_lg + jax.lax.dot_general(lg, tril_i, (((1,), (0,)), ((), ())), **_DOT)
                T_i = jnp.exp(logT_fin - suf_incl)
                w = a * T_i
                okf = ok.astype(jnp.float32)

            flip = jnp.where(g["denom"] > 0, -1.0, 1.0)
            nx, ny, nz = g["n"]
            # G_i = dL/dw_i
            Gw = (
                dRGB[:, 0:1] * cols[0]
                + dRGB[:, 1:2] * cols[1]
                + dRGB[:, 2:3] * cols[2]
            )
            Gw = Gw + g["t"] * dDep
            Gw = Gw + flip * (
                nx * dNrm[:, 0:1] + ny * dNrm[:, 1:2] + nz * dNrm[:, 2:3]
            )

            gw = Gw * w
            if exact_order:
                suf_gw = carry_gw + _slab_matvec(_after_mask, t_key, gw, lane_after)
            else:
                suf_gw = carry_gw + jax.lax.dot_general(gw, tril_s, (((1,), (0,)), ((), ())), **_DOT)
            one_m = jnp.where(ok, 1.0 - a, 1.0)
            dalpha = (T_i * Gw - suf_gw / one_m - (final_T / one_m) * dTfin) * okf

            dG_g = g["opa"] * dalpha
            dopa = jnp.sum(g["G"] * dalpha, axis=0, keepdims=True)  # (1,K)
            drho = -0.5 * g["G"] * dG_g
            du = 2.0 * g["u"] * drho
            dv = 2.0 * g["v"] * drho
            tux, tuy, tuz = g["tu"]
            tvx, tvy, tvz = g["tv"]
            qx, qy, qz = g["q"]
            dqx = du * tux + dv * tvx
            dqy = du * tuy + dv * tvy
            dqz = du * tuz + dv * tvz
            dtu = [jnp.sum(du * q_, axis=0, keepdims=True) for q_ in (qx, qy, qz)]
            dtv = [jnp.sum(dv * q_, axis=0, keepdims=True) for q_ in (qx, qy, qz)]

            dx_, dy_, dz_ = d
            # dt chain: depth output (w * dDep) + q = o + t*d - p.
            dt = w * dDep * okf + dqx * dx_ + dqy * dy_ + dqz * dz_
            # t = <po, n>/denom
            inv_den = 1.0 / g["den_s"]
            pox, poy, poz = g["po"]
            dp_x = -dqx + dt * nx * inv_den
            dp_y = -dqy + dt * ny * inv_den
            dp_z = -dqz + dt * nz * inv_den
            dden = -g["t"] * inv_den * dt
            dn_x = dt * pox * inv_den + dden * dx_ + w * flip * dNrm[:, 0:1] * okf
            dn_y = dt * poy * inv_den + dden * dy_ + w * flip * dNrm[:, 1:2] * okf
            dn_z = dt * poz * inv_den + dden * dz_ + w * flip * dNrm[:, 2:3] * okf

            # Ray gradients (accumulated over lanes).
            do_x = jnp.sum(dqx - dt * nx * inv_den, axis=1, keepdims=True)
            do_y = jnp.sum(dqy - dt * ny * inv_den, axis=1, keepdims=True)
            do_z = jnp.sum(dqz - dt * nz * inv_den, axis=1, keepdims=True)
            dd_x = jnp.sum(g["t"] * dqx + dden * nx, axis=1, keepdims=True)
            dd_y = jnp.sum(g["t"] * dqy + dden * ny, axis=1, keepdims=True)
            dd_z = jnp.sum(g["t"] * dqz + dden * nz, axis=1, keepdims=True)

            # SH rows: dsh_{c,k,lane} = Y[r,k] * dRGB[r,c] * w (clamp-gated);
            # ray-dir grads through the analytic basis Jacobian.
            dsh_rows = []
            dY = jnp.zeros((NRAY, Ymat.shape[1]), jnp.float32)
            for c in range(3):
                Xc = dRGB[:, c : c + 1] * w * (raws[c] > 0.0).astype(jnp.float32)
                sh_c = pay[ROW_SH + c * n_sh : ROW_SH + (c + 1) * n_sh, :]
                dsh_rows.append(
                    jax.lax.dot_general(Ymat, Xc, (((0,), (0,)), ((), ())), **_DOT)
                )
                dY = dY + jax.lax.dot_general(
                    Xc, sh_c, (((1,), (1,)), ((), ())), **_DOT
                )
            if n_sh > 1:
                xu, yu, zu = d_unit
                gb = sh_basis_grad(xu, yu, zu, n_sh)
                du_x = sum(dY[:, k : k + 1] * gb[k][0] for k in range(n_sh))
                du_y = sum(dY[:, k : k + 1] * gb[k][1] for k in range(n_sh))
                du_z = sum(dY[:, k : k + 1] * gb[k][2] for k in range(n_sh))
                # unit = d / |d|:  dd = (du - unit <unit, du>) / |d|
                proj = xu * du_x + yu * du_y + zu * du_z
                dd_x = dd_x + inv_norm * (du_x - xu * proj)
                dd_y = dd_y + inv_norm * (du_y - yu * proj)
                dd_z = dd_z + inv_norm * (du_z - zu * proj)

            def rsum(x):
                return jnp.sum(x, axis=0, keepdims=True)

            rows = (
                [rsum(dp_x), rsum(dp_y), rsum(dp_z)]
                + dtu
                + dtv
                + [rsum(dn_x), rsum(dn_y), rsum(dn_z), dopa]
            )
            grad = jnp.concatenate(rows + dsh_rows, axis=0)
            pad = pay_rows(n_sh) - grad.shape[0]
            if pad:
                grad = jnp.concatenate([grad, jnp.zeros((pad, K), jnp.float32)], axis=0)
            grad_vmem[:] = grad

            return (
                carry_gw + jnp.sum(gw, axis=1, keepdims=True),
                carry_lg + jnp.sum(lg, axis=1, keepdims=True),
                do_acc + jnp.concatenate([do_x, do_y, do_z], axis=1),
                dd_acc + jnp.concatenate([dd_x, dd_y, dd_z], axis=1),
            )

        def skip(carry_gw, carry_lg, do_acc, dd_acc):
            grad_vmem[:] = jnp.zeros((pay_rows(n_sh), K_CHUNK), jnp.float32)
            return carry_gw, carry_lg, do_acc, dd_acc

        carry = jax.lax.cond(is_active, compute, skip, carry_gw, carry_lg, do_acc, dd_acc)
        cpo = pltpu.make_async_copy(grad_vmem, dpayload_hbm.at[:, pl.ds(off, K)], sem_out)
        cpo.start()
        cpo.wait()
        return carry

    z1 = jnp.zeros((NRAY, 1), jnp.float32)
    z3 = jnp.zeros((NRAY, 3), jnp.float32)
    _, _, do_acc, dd_acc = jax.lax.fori_loop(0, n_chunks, body, (z1, z1, z3, z3))
    drays = jnp.concatenate([do_acc, dd_acc, jnp.zeros((NRAY, 2), jnp.float32)], axis=1)
    drays_ref[0] = drays


def trace_bundles_bwd(
    payload, rays, seg_start, seg_count, seg_active, fwd_out, cotangent,
    n_sh: int = 16, tmin: float = 1e-3, interpret: bool = False,
    exact_order: bool = False,
):
    NB = rays.shape[0]
    C_PAY = pay_rows(n_sh)
    kernel = functools.partial(
        _bwd_kernel, tmin=tmin, n_sh=n_sh, exact_order=exact_order
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, NRAY, 8), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NRAY, C_OUT), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NRAY, C_OUT), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, NRAY, 8), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((C_PAY, K_CHUNK), jnp.float32),
            pltpu.VMEM((C_PAY, K_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(payload.shape, jnp.float32),
            jax.ShapeDtypeStruct((NB, NRAY, 8), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_EXACT if exact_order else None
        ),
    )(seg_start, seg_count, seg_active, payload, rays, fwd_out, cotangent)
