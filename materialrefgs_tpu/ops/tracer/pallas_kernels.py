"""Pallas TPU kernels for the bundle splat tracer (fwd + bwd).

TPU-native replacement for the OptiX surfel tracer (EnvGS /
diff_surfel_tracing, wrapped by gaussian_renderer/optix_utils.py): instead of
per-ray BVH traversal, rays are grouped into coherent bundles of 256 (pixel
tiles of the reflected-ray map), gaussians are cone-culled and depth-ordered
per bundle (see api.py), and each bundle composites its sorted pair list in
K=128 chunks exactly like the tile rasterizer — log-transmittance prefix via
triangular MXU matmuls, collective early exit.

Per (ray, gaussian) math: ray-plane intersection t = <p - o, n>/<d, n>, splat
coords u = <q, tu/su>, v = <q, tv/sv>, rho = u^2 + v^2 with 3-sigma cutoff,
alpha = min(0.99, opa * exp(-rho/2)) — the same alpha law as the rasterizer.
The backward walks chunks in reverse, reconstructs T from the saved final_T,
and emits per-pair payload gradients + per-ray (origin, direction) gradients.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from materialrefgs_tpu.ops.rasterize.layout import DEAD, K_CHUNK, LOG_T_STOP

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
RHO_CUTOFF = 9.0
NRAY = 256  # rays per bundle

# Payload rows
ROW_P = 0  # 0:3 center
ROW_TU = 3  # 3:6 tu / su
ROW_TV = 6  # 6:9 tv / sv
ROW_N = 9  # 9:12 unit normal
ROW_OPA = 12
ROW_COLOR = 13  # 13:16 per-pair rgb
C_PAY = 16

# Forward output channels
OUT_RGB = 0  # 0:3
OUT_DEPTH = 3
OUT_NORMAL = 4  # 4:7
OUT_FINAL_T = 7
OUT_NCONTRIB = 8
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


def _fwd_kernel(
    seg_start_ref, seg_count_ref,
    payload_hbm, rays_ref,
    out_ref,
    chunk_vmem, sem,
    *, tmin: float, exact_order: bool = False,
):
    K = K_CHUNK
    b = pl.program_id(0)
    start = seg_start_ref[b]
    count = seg_count_ref[b]
    n_chunks = (count + K - 1) // K

    o = tuple(rays_ref[0, :, i : i + 1] for i in range(3))  # (256,1) each
    d = tuple(rays_ref[0, :, 3 + i : 4 + i] for i in range(3))
    m_incl = _tri(K, strict=False)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

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
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 1)
            lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 2)
            SLAB = 64
            parts = []
            for r0 in range(0, NRAY, SLAB):
                tk = t_key[r0 : r0 + SLAB]
                lgs = lg[r0 : r0 + SLAB]
                ti = tk[:, :, None]
                tj = tk[:, None, :]
                mask = ((tj < ti) | ((tj == ti) & (lane_j < lane_i))).astype(
                    jnp.float32
                )
                parts.append(
                    jax.lax.dot_general(
                        mask, lgs, (((2,), (1,)), ((0,), (0,))), **_DOT
                    )
                )
            logT_excl = logT + jnp.concatenate(parts, axis=0)
            logT_incl = logT_excl + lg
        else:
            logT_incl = logT + jax.lax.dot_general(lg, m_incl, (((1,), (0,)), ((), ())), **_DOT)
            logT_excl = logT_incl - lg
        included = logT_incl >= LOG_T_STOP
        w = a * jnp.exp(logT_excl) * included.astype(jnp.float32)

        flip = jnp.where(g["denom"] > 0, -1.0, 1.0)
        lin = jnp.concatenate(
            [
                pay[ROW_COLOR : ROW_COLOR + 3, :],  # rgb rows (3,K)
            ],
            axis=0,
        )
        rgb = rgb + jax.lax.dot_general(w, lin, (((1,), (1,)), ((), ())), **_DOT)
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
    _, _, rgb, dep, nrm, final_logT, n_contrib = jax.lax.while_loop(cond, body, init)
    outs = jnp.concatenate(
        [rgb, dep, nrm, jnp.exp(final_logT), n_contrib], axis=1
    )
    pad = C_OUT - outs.shape[1]
    outs = jnp.concatenate([outs, jnp.zeros((NRAY, pad), jnp.float32)], axis=1)
    out_ref[0] = outs


def trace_bundles_fwd(
    payload: jax.Array,  # (C_PAY, B + K)
    rays: jax.Array,  # (NB, 256, 8) [o(3), d(3), pad]
    seg_start: jax.Array,  # (NB+1,)
    seg_count: jax.Array,  # (NB,)
    tmin: float = 1e-3,
    interpret: bool = False,
    exact_order: bool = False,
) -> jax.Array:
    NB = rays.shape[0]
    kernel = functools.partial(_fwd_kernel, tmin=tmin, exact_order=exact_order)
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
    )(seg_start, seg_count, payload, rays)


def _bwd_kernel(
    seg_start_ref, seg_count_ref, seg_active_ref,
    payload_hbm, rays_ref, fwd_ref, cot_ref,
    dpayload_hbm, drays_ref,
    chunk_vmem, grad_vmem, sem_in, sem_out,
    *, tmin: float,
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
    final_T = fwd_ref[0, :, OUT_FINAL_T : OUT_FINAL_T + 1]
    n_contrib = fwd_ref[0, :, OUT_NCONTRIB : OUT_NCONTRIB + 1]
    logT_fin = jnp.log(jnp.maximum(final_T, 1e-30))
    dRGB = cot_ref[0, :, OUT_RGB : OUT_RGB + 3]
    dDep = cot_ref[0, :, OUT_DEPTH : OUT_DEPTH + 1]
    dNrm = cot_ref[0, :, OUT_NORMAL : OUT_NORMAL + 3]
    dTfin = cot_ref[0, :, OUT_FINAL_T : OUT_FINAL_T + 1]

    tril_i = _tri(K, strict=False, suffix=True)
    tril_s = _tri(K, strict=True, suffix=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

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
            within = idx1 <= n_contrib
            ok = g["ok"] & lane_ok & within
            a = jnp.where(ok, g["alpha"], 0.0)
            okf = ok.astype(jnp.float32)

            lg = jnp.log1p(-a)
            suf_incl = carry_lg + jax.lax.dot_general(lg, tril_i, (((1,), (0,)), ((), ())), **_DOT)
            T_i = jnp.exp(logT_fin - suf_incl)
            w = a * T_i

            flip = jnp.where(g["denom"] > 0, -1.0, 1.0)
            nx, ny, nz = g["n"]
            # G_i = dL/dw_i
            col = pay[ROW_COLOR : ROW_COLOR + 3, :]
            Gw = jax.lax.dot_general(dRGB, col, (((1,), (0,)), ((), ())), **_DOT)
            Gw = Gw + g["t"] * dDep
            Gw = Gw + flip * (
                nx * dNrm[:, 0:1] + ny * dNrm[:, 1:2] + nz * dNrm[:, 2:3]
            )

            gw = Gw * w
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

            def rsum(x):
                return jnp.sum(x, axis=0, keepdims=True)

            dcol = jax.lax.dot_general(dRGB, w, (((0,), (0,)), ((), ())), **_DOT)  # (3,K)
            rows = (
                [rsum(dp_x), rsum(dp_y), rsum(dp_z)]
                + dtu
                + dtv
                + [rsum(dn_x), rsum(dn_y), rsum(dn_z), dopa]
            )
            grad = jnp.concatenate(rows + [dcol], axis=0)  # (16, K)
            pad = C_PAY - grad.shape[0]
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
            grad_vmem[:] = jnp.zeros((C_PAY, K_CHUNK), jnp.float32)
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
    tmin: float = 1e-3, interpret: bool = False,
):
    NB = rays.shape[0]
    kernel = functools.partial(_bwd_kernel, tmin=tmin)
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
    )(seg_start, seg_count, seg_active, payload, rays, fwd_out, cotangent)
