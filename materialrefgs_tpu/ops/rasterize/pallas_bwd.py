"""Pallas TPU backward kernel for the tile rasterizer.

TPU-native redesign of backward.cu renderCUDA (backward.cu:146-468). Walks
each tile's pair list back-to-front in K-chunks:

  - transmittance is reconstructed in log space from the saved final_T
    (replaces the CUDA `T = T / (1 - alpha)` scalar walk),
  - the per-pair alpha gradient uses the unified rule
      dL/da_i = T_i * G_i - (sum_{j>i} G_j w_j) / (1 - a_i)
                - T_fin/(1 - a_i) * dL/dT_fin
    where G_i = dL/dw_i collects color/feature/normal/depth/M1/M2/distortion
    terms; suffix sums are (256,K) @ (K,K) triangular MXU matmuls + carries
    (replaces CUDA's accum_rec / last_dL_dT recurrences; algebraically equal),
  - the distortion w- and m- gradients use the total-sum identity with the
    saved M1/M2/final_T exactly as backward.cu:371-387,
  - per-pair payload gradients (dTu/dTv/dTw/dmean2d/dopacity/dlin) are
    reduced over the 256 pixels and DMA'd out CHUNK-MAJOR with the owning
    gaussian id stamped on row_gid; the caller scatter-adds them into
    per-gaussian gradients (replaces atomicAdd).

Gradient semantics intentionally replicate the CUDA kernel, including the
pass-through gradient of the alpha=min(0.99, o*G) clamp (backward.cu:328/425).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from materialrefgs_tpu.ops.rasterize.layout import (
    K_CHUNK,
    PIX,
    ROW_LIN,
    ROW_MEAN2D,
    ROW_OPACITY,
    ROW_TU,
    ROW_TV,
    ROW_TW,
    TILE,
    acc_channels,
    out_channels_padded,
    out_layout,
    payload_channels_padded,
    row_gid,
)
from materialrefgs_tpu.ops.rasterize.layout import (
    ALPHA_MAX,
    ALPHA_MIN,
    FAR_N,
    FILTER_INV_SQUARE,
    NEAR_N,
)

from materialrefgs_tpu.ops.rasterize.pallas_fwd import MM_PRECISION  # noqa: E402


def _tril_strict(K: int) -> jax.Array:
    """M[j, i] = 1 if j > i: x @ M gives exclusive suffix sums along lanes."""
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r > c).astype(jnp.float32)


def _tril_incl(K: int) -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r >= c).astype(jnp.float32)


def _bwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    tile_active_ref,
    chunk_base_ref,
    # inputs
    payload_hbm,
    fwd_tile_ref,  # (1, 256, C_OUT) VMEM — saved forward outputs for this tile
    cot_tile_ref,  # (1, 256, C_OUT) VMEM — output cotangents for this tile
    # outputs
    dpayload_hbm,
    # scratch
    chunk_vmem,
    grad_vmem,
    sem_in,
    sem_out,
    *,
    S: int,
    grid_x: int,
    W: int,
    H: int,
):
    K = K_CHUNK
    ACC = acc_channels(S)
    layout = out_layout(S)
    C_PAD = payload_channels_padded(S)
    GID = row_gid(S)

    t = pl.program_id(0)
    start = tile_start_ref[t]  # RAW offset (binning.bin_pairs)
    count = tile_count_ref[t]
    end = start + count
    active = tile_active_ref[t]
    # Over-read alignment (same windows as the forward kernel): read chunks
    # at 128-aligned offsets and mask head/tail lanes. Gradient chunks are
    # written CHUNK-MAJOR at chunk_base[t] so overlapping read windows of
    # adjacent tiles never produce overlapping writes; the owning gaussian
    # id rides row_gid of each written chunk for the caller's scatter-add.
    base = (start // K) * K
    head = start - base
    cb = chunk_base_ref[t]
    n_chunks = jnp.where(count > 0, (head + count + K - 1) // K, 0)
    active_chunks = jnp.where(active > 0, (head + active + K - 1) // K, 0)

    tx = t % grid_x
    ty = t // grid_x
    pid = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    pix_x = (tx * TILE + pid % TILE).astype(jnp.float32)
    pix_y = (ty * TILE + pid // TILE).astype(jnp.float32)

    def ch(ref, name):
        a, b = layout[name]
        return ref[0, :, a:b]  # (256, b-a)

    final_T = ch(fwd_tile_ref, "final_T")  # (256,1)
    M1_tot = ch(fwd_tile_ref, "M1")
    M2_tot = ch(fwd_tile_ref, "M2")
    n_contrib = ch(fwd_tile_ref, "n_contrib")  # float, 1-based
    med_contrib = ch(fwd_tile_ref, "median_contrib")
    A_tot = 1.0 - final_T
    logT_fin = jnp.log(jnp.maximum(final_T, 1e-30))

    dLin = cot_tile_ref[0, :, 0:ACC]  # (256, ACC) color+feature+normal
    dD = ch(cot_tile_ref, "depth")
    dM1 = ch(cot_tile_ref, "M1")
    dM2 = ch(cot_tile_ref, "M2")
    dReg = ch(cot_tile_ref, "distortion")
    dMed = ch(cot_tile_ref, "median_depth")
    dTfin = ch(cot_tile_ref, "final_T")

    tril_s = _tril_strict(K)
    tril_i = _tril_incl(K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    gamma = FAR_N / (FAR_N - NEAR_N)

    # Chunks past the last contributor still own chunk-major output slots
    # (the caller scatter-adds every slot below chunk_base[T]), so they must
    # be written as zeros — the zero gid row marks every lane invalid.
    grad_vmem[0] = jnp.zeros((C_PAD, K), jnp.float32)

    def zero_body(it, x):
        ooff = pl.multiple_of((cb + active_chunks + it) * K, K)
        cp = pltpu.make_async_copy(
            grad_vmem.at[0], dpayload_hbm.at[:, pl.ds(ooff, K)], sem_out.at[0]
        )
        cp.start()
        cp.wait()
        return x

    jax.lax.fori_loop(0, n_chunks - active_chunks, zero_body, 0)

    def start_in(chunk_i):
        # Prefetch of "chunk -1" (last iteration) clamps its offset to chunk 0
        # but keeps the unclamped index's slot parity, so it never lands in
        # the slot the current iteration is reading.
        slot = jax.lax.rem(chunk_i + 2, 2)
        ci = jnp.maximum(chunk_i, 0)
        off = pl.multiple_of(base + ci * K, K)
        pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, K)], chunk_vmem.at[slot], sem_in.at[slot]
        ).start()

    @pl.when(active_chunks > 0)
    def _():
        start_in(active_chunks - 1)

    def body(it, carry):
        carry_gw, carry_lg = carry  # (256,1) each
        chunk_i = active_chunks - 1 - it
        off = pl.multiple_of(base + chunk_i * K, K)
        ooff = pl.multiple_of((cb + chunk_i) * K, K)

        def compute(carry_gw, carry_lg):
            # Double-buffered in-DMA: wait for this chunk's copy, prefetch
            # the next (back-to-front, so chunk_i - 1) into the other slot.
            slot = jax.lax.rem(chunk_i, 2)
            pltpu.make_async_copy(
                payload_hbm.at[:, pl.ds(off, K)], chunk_vmem.at[slot],
                sem_in.at[slot],
            ).wait()
            start_in(chunk_i - 1)
            pay = chunk_vmem[slot]
            tu_x, tu_y, tu_z = (pay[ROW_TU + i, :][None, :] for i in range(3))
            tv_x, tv_y, tv_z = (pay[ROW_TV + i, :][None, :] for i in range(3))
            tw_x, tw_y, tw_z = (pay[ROW_TW + i, :][None, :] for i in range(3))
            c2x = pay[ROW_MEAN2D, :][None, :]
            c2y = pay[ROW_MEAN2D + 1, :][None, :]
            opa = pay[ROW_OPACITY, :][None, :]

            # Recompute forward per-(pixel, lane) quantities.
            kx = pix_x * tw_x - tu_x
            ky = pix_x * tw_y - tu_y
            kz = pix_x * tw_z - tu_z
            lx = pix_y * tw_x - tv_x
            ly = pix_y * tw_y - tv_y
            lz = pix_y * tw_z - tv_z
            px = ky * lz - kz * ly
            py = kz * lx - kx * lz
            pz = kx * ly - ky * lx
            pz_ok = pz != 0.0
            pz_safe = jnp.where(pz_ok, pz, 1.0)
            s1 = px / pz_safe
            s2 = py / pz_safe
            rho3d = s1 * s1 + s2 * s2
            d1 = c2x - pix_x
            d2 = c2y - pix_y
            rho2d = FILTER_INV_SQUARE * (d1 * d1 + d2 * d2)
            use3d = rho3d <= rho2d
            rho = jnp.minimum(rho3d, rho2d)
            depth_px = jnp.where(use3d, s1 * tw_x + s2 * tw_y + tw_z, tw_z)
            power = -0.5 * rho
            Gg = jnp.exp(power)
            alpha = jnp.minimum(ALPHA_MAX, opa * Gg)

            idx1 = (chunk_i * K + lane + 1 - head).astype(jnp.float32)  # (1, K)
            lane_idx = off + lane
            lane_ok = (lane_idx >= start) & (lane_idx < end)
            within = idx1 <= n_contrib  # (256, K) per-pixel contributor bound
            ok = (
                pz_ok
                & (depth_px >= NEAR_N)
                & (power <= 0.0)
                & (alpha >= ALPHA_MIN)
                & lane_ok
                & within
            )
            a = jnp.where(ok, alpha, 0.0)
            okf = ok.astype(jnp.float32)

            # Reconstruct T_i = T_fin / prod_{j>=i}(1 - a_j) in log space.
            lg = jnp.log1p(-a)
            suf_incl = carry_lg + jax.lax.dot_general(
                lg, tril_i, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=MM_PRECISION,
            )
            T_i = jnp.exp(logT_fin - suf_incl)
            w = a * T_i

            depth_safe = jnp.where(ok, depth_px, 1.0)
            m = gamma * (1.0 - NEAR_N / depth_safe)

            # G_i = dL/dw_i.
            lin = pay[ROW_LIN : ROW_LIN + ACC, :]  # (ACC, K)
            G = jax.lax.dot_general(
                dLin, lin, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=MM_PRECISION,
            )  # (256, K)
            G = G + depth_px * dD + m * dM1 + (m * m) * dM2
            G = G + (M2_tot + m * m * A_tot - 2.0 * m * M1_tot) * dReg

            gw = G * w
            suf_gw = carry_gw + jax.lax.dot_general(
                gw, tril_s, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=MM_PRECISION,
            )
            one_m = jnp.where(ok, 1.0 - a, 1.0)
            dalpha = T_i * G - suf_gw / one_m - (final_T / one_m) * dTfin
            dalpha = dalpha * okf

            # Depth gradient.
            dmd_dd = (FAR_N * NEAR_N) / ((FAR_N - NEAR_N) * depth_safe * depth_safe)
            dz = w * dD
            dz = dz + jnp.where(idx1 == med_contrib, dMed, 0.0)
            dz = dz + (2.0 * w * (m * A_tot - M1_tot) * dReg + w * dM1 + 2.0 * w * m * dM2) * dmd_dd
            dz = dz * okf

            dG_g = opa * dalpha  # pass-through min clamp, as CUDA
            dopacity = jnp.sum(Gg * dalpha, axis=0, keepdims=True)  # (1, K)

            # 3D branch chain.
            use3df = use3d.astype(jnp.float32) * okf
            ds1 = (dG_g * (-Gg) * s1 + dz * tw_x) * use3df
            ds2 = (dG_g * (-Gg) * s2 + dz * tw_y) * use3df
            ds1_pz = ds1 / pz_safe
            ds2_pz = ds2 / pz_safe
            dp1 = ds1_pz
            dp2 = ds2_pz
            dp3 = -(ds1_pz * s1 + ds2_pz * s2)
            # dL_dk = cross(l, dp); dL_dl = cross(dp, k)
            dk1 = ly * dp3 - lz * dp2
            dk2 = lz * dp1 - lx * dp3
            dk3 = lx * dp2 - ly * dp1
            dl1 = dp2 * kz - dp3 * ky
            dl2 = dp3 * kx - dp1 * kz
            dl3 = dp1 * ky - dp2 * kx
            dzu = dz * use3df
            dTu = [-dk1, -dk2, -dk3]
            dTv = [-dl1, -dl2, -dl3]
            dTw = [
                pix_x * dk1 + pix_y * dl1 + dzu * s1,
                pix_x * dk2 + pix_y * dl2 + dzu * s2,
                pix_x * dk3 + pix_y * dl3 + dzu,
            ]
            # 2D branch: mean2d gradient + Tw.z depth pass-through.
            use2df = (1.0 - use3d.astype(jnp.float32)) * okf
            dmean_x = dG_g * (-Gg) * FILTER_INV_SQUARE * d1 * use2df
            dmean_y = dG_g * (-Gg) * FILTER_INV_SQUARE * d2 * use2df
            dTw[2] = dTw[2] + dz * use2df

            def rsum(x):  # (256,K) -> (1,K)
                return jnp.sum(x, axis=0, keepdims=True)

            rows = [rsum(v) for v in dTu + dTv + dTw] + [
                rsum(dmean_x),
                rsum(dmean_y),
                dopacity,
            ]
            hrows = jnp.concatenate(rows, axis=0)  # (12, K)
            dlin = jax.lax.dot_general(
                dLin, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=MM_PRECISION,
            )  # (ACC, K)
            # Stamp (gid + 1) from the payload's row_gid channel onto the
            # same row of the gradient chunk; over-read/out-of-range lanes
            # get 0 so the caller's scatter-add drops them.
            gid_row = pay[GID : GID + 1, :] * lane_ok.astype(jnp.float32)
            grad = jnp.concatenate([hrows, dlin, gid_row], axis=0)
            pad = C_PAD - grad.shape[0]
            if pad:
                grad = jnp.concatenate(
                    [grad, jnp.zeros((pad, K), jnp.float32)], axis=0
                )

            # Double-buffered out-DMA: before overwriting this grad slot,
            # wait for the copy started two iterations ago from it.
            gslot = jax.lax.rem(chunk_i, 2)

            @pl.when(it >= 2)
            def _():
                pltpu.make_async_copy(
                    grad_vmem.at[gslot], dpayload_hbm.at[:, pl.ds(ooff, K)],
                    sem_out.at[gslot],
                ).wait()

            grad_vmem[gslot] = grad
            pltpu.make_async_copy(
                grad_vmem.at[gslot], dpayload_hbm.at[:, pl.ds(ooff, K)],
                sem_out.at[gslot],
            ).start()

            new_gw = carry_gw + jnp.sum(gw, axis=1, keepdims=True)
            new_lg = carry_lg + jnp.sum(lg, axis=1, keepdims=True)
            return new_gw, new_lg

        return compute(carry_gw, carry_lg)

    zeros1 = jnp.zeros((PIX, 1), jnp.float32)
    jax.lax.fori_loop(0, active_chunks, body, (zeros1, zeros1))

    # Drain: one in-prefetch (always lands in slot 1: the last body prefetched
    # "chunk -1" with slot parity of index -1) and the last one or two
    # out-copies are still in flight.
    @pl.when(active_chunks > 0)
    def _():
        pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(pl.multiple_of(base, K), K)],
            chunk_vmem.at[1], sem_in.at[1],
        ).wait()
        ooff0 = pl.multiple_of(cb * K, K)
        pltpu.make_async_copy(
            grad_vmem.at[0], dpayload_hbm.at[:, pl.ds(ooff0, K)], sem_out.at[0]
        ).wait()

    @pl.when(active_chunks > 1)
    def _():
        ooff1 = pl.multiple_of((cb + 1) * K, K)
        pltpu.make_async_copy(
            grad_vmem.at[1], dpayload_hbm.at[:, pl.ds(ooff1, K)], sem_out.at[1]
        ).wait()


def rasterize_tiles_bwd(
    payload: jax.Array,  # (C_PAD, B + 2*K)
    tile_start: jax.Array,  # (T+1,) int32 RAW offsets (kernel over-reads)
    tile_count: jax.Array,  # (T,) int32 valid pairs per tile
    tile_active: jax.Array,  # (T,) int32 max contributors per tile
    chunk_base: jax.Array,  # (T+1,) int32 cumulative chunk windows per tile
    fwd_out: jax.Array,  # (T, 256, C_OUT)
    cotangent: jax.Array,  # (T, 256, C_OUT)
    *,
    S: int,
    grid_x: int,
    grid_y: int,
    W: int,
    H: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns CHUNK-MAJOR per-pair payload gradients
    (C_PAD, n_chunk_slots * K): tile t's chunk i lives at columns
    [(chunk_base[t]+i)*K, ...). Row row_gid(S) carries (gaussian id + 1)
    per lane (0 = invalid/over-read lane); columns at or past
    chunk_base[T]*K are never written and must be dropped by the caller."""
    from materialrefgs_tpu.ops.rasterize.binning import n_chunk_slots

    num_tiles = grid_x * grid_y
    C_PAD = payload_channels_padded(S)
    C_OUT = out_channels_padded(S)
    B = payload.shape[1] - 2 * K_CHUNK
    nslots = n_chunk_slots(B, num_tiles)

    kernel = functools.partial(_bwd_kernel, S=S, grid_x=grid_x, W=W, H=H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, PIX, C_OUT), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, PIX, C_OUT), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C_PAD, K_CHUNK), jnp.float32),
            pltpu.VMEM((2, C_PAD, K_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C_PAD, nslots * K_CHUNK), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, tile_active, chunk_base, payload, fwd_out, cotangent)
