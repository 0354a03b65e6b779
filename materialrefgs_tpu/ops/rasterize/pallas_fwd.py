"""Pallas TPU forward kernel for the 2D surfel tile rasterizer.

TPU-native redesign of renderCUDA (forward.cu:272-463). Instead of one thread
per pixel with a sequential per-gaussian loop, each grid step processes one
16x16 tile as dense (256 pixels x K gaussians) VPU math:

  - per-chunk DMA of K=128 depth-sorted pair payload columns from HBM,
  - alpha for all (pixel, gaussian) at once,
  - front-to-back compositing via log-transmittance prefix sums computed as
    (256,K) @ (K,K) triangular MXU matmuls (the scan becomes a matmul),
  - color/feature/normal accumulation as one (256,K) @ (K,ACC) matmul,
  - collective early exit when every pixel's transmittance < 1e-4.

Numerical contract is identical to the CUDA kernel (validated against the
pure-jnp reference in tests/test_rasterize_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from materialrefgs_tpu.ops.rasterize.layout import (
    ALPHA_MAX,
    ALPHA_MIN,
    DEAD,
    K_CHUNK,
    LOG_HALF,
    LOG_T_STOP,
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
)
from materialrefgs_tpu.ops.rasterize.layout import FAR_N, FILTER_INV_SQUARE, NEAR_N

# Measured on TPU v5e: these (256,128)@(128,128) dots are pipeline-bound,
# not MXU-throughput-bound — DEFAULT (1-pass bf16, rel err 2.4e-3) is NOT
# faster than HIGHEST (6-pass f32, rel err 2.2e-5), so full precision is
# free. Keep HIGHEST: the log-transmittance prefix feeds exp() and pixel
# colors directly, and round-1 showed bf16 matmul corruption degrades
# training. (Mosaic does not lower Precision.HIGH.)
MM_PRECISION = jax.lax.Precision.HIGHEST


def _tri_strict(K: int) -> jax.Array:
    """M[j, i] = 1 if j < i: w @ M gives exclusive prefix sums along lanes."""
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r < c).astype(jnp.float32)


def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,
    tile_count_ref,
    # inputs
    payload_hbm,
    # outputs
    out_ref,
    # scratch
    chunk_vmem,
    sem,
    *,
    S: int,
    grid_x: int,
    W: int,
    H: int,
):
    K = K_CHUNK
    ACC = acc_channels(S)
    layout = out_layout(S)
    C_OUT = out_channels_padded(S)

    t = pl.program_id(0)
    start = tile_start_ref[t]  # RAW offset (binning.bin_pairs)
    count = tile_count_ref[t]
    end = start + count
    # Over-read alignment: DMA the enclosing 128-aligned window and mask the
    # head/tail lanes — no padded slot layout exists in HBM.
    base = (start // K) * K
    head = start - base
    n_chunks = jnp.where(count > 0, (head + count + K - 1) // K, 0)

    tx = t % grid_x
    ty = t // grid_x
    pid = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    pix_x = (tx * TILE + pid % TILE).astype(jnp.float32)  # (256,1)
    pix_y = (ty * TILE + pid // TILE).astype(jnp.float32)
    inside = (pix_x < W) & (pix_y < H)

    m_strict = _tri_strict(K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def start_copy(chunk_i):
        # Safe for chunk_i == n_chunks: the payload is padded with 2*K zero
        # columns past B (api.rasterize), so the one-ahead prefetch of the
        # last iteration stays in bounds.
        off = pl.multiple_of(base + chunk_i * K, K)
        slot = jax.lax.rem(chunk_i, 2)
        pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, K)], chunk_vmem.at[slot], sem.at[slot]
        ).start()

    @pl.when(n_chunks > 0)
    def _():
        start_copy(0)

    def body(carry):
        (
            chunk_i,
            logT,
            acc,
            depth_acc,
            m1_acc,
            m2_acc,
            dist_acc,
            w_sum,
            wm_sum,
            wm2_sum,
            med_depth,
            med_idx,
            n_contrib,
            final_logT,
        ) = carry

        # Double-buffered DMA: wait for this chunk's copy (started one
        # iteration ago), then immediately prefetch the next chunk into the
        # other slot so the copy overlaps this chunk's math.
        off = pl.multiple_of(base + chunk_i * K, K)
        slot = jax.lax.rem(chunk_i, 2)
        pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, K)], chunk_vmem.at[slot], sem.at[slot]
        ).wait()
        start_copy(chunk_i + 1)

        pay = chunk_vmem[slot]  # (C_PAD, K)
        tu_x, tu_y, tu_z = (pay[ROW_TU + i, :][None, :] for i in range(3))
        tv_x, tv_y, tv_z = (pay[ROW_TV + i, :][None, :] for i in range(3))
        tw_x, tw_y, tw_z = (pay[ROW_TW + i, :][None, :] for i in range(3))
        c2x = pay[ROW_MEAN2D, :][None, :]
        c2y = pay[ROW_MEAN2D + 1, :][None, :]
        opa = pay[ROW_OPACITY, :][None, :]

        # Ray-splat intersection (forward.cu:366-382).
        kx = pix_x * tw_x - tu_x  # (256, K)
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
        alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))

        lane_idx = off + lane
        lane_ok = (lane_idx >= start) & (lane_idx < end)
        ok = (
            pz_ok
            & (depth_px >= NEAR_N)
            & (power <= 0.0)
            & (alpha >= ALPHA_MIN)
            & lane_ok
        )
        a = jnp.where(ok, alpha, 0.0)

        # Log-transmittance prefix (the sequential scan as a matmul).
        # lg @ m_incl == lg @ m_strict + lg exactly (m_incl = m_strict + I),
        # so the inclusive prefix is one elementwise add, not a second
        # (256,K)@(K,K) matmul.
        lg = jnp.log1p(-a)
        logT_excl = logT + jax.lax.dot_general(
            lg, m_strict, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=MM_PRECISION,
        )
        logT_incl = logT_excl + lg
        included = logT_incl >= LOG_T_STOP
        w = a * jnp.exp(logT_excl) * included.astype(jnp.float32)

        # Linear accumulation: color + features + normal in one MXU call.
        lin = pay[ROW_LIN : ROW_LIN + ACC, :]  # (ACC, K)
        acc = acc + jax.lax.dot_general(
            w, lin, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=MM_PRECISION,
        )

        depth_safe = jnp.where(ok, depth_px, 1.0)
        m_ndc = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / depth_safe)
        wm = w * m_ndc
        wm2 = wm * m_ndc

        depth_acc = depth_acc + jnp.sum(w * depth_px, axis=1, keepdims=True)
        # Distortion (forward.cu:407-415): exclusive prefixes + carries.
        # One stacked (3*256, K)@(K, K) dot instead of three (256, K) dots:
        # identical math, one MXU pipeline fill instead of three.
        pref = jax.lax.dot_general(
            jnp.concatenate([w, wm, wm2], axis=0), m_strict,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=MM_PRECISION,
        )
        A_excl = w_sum + pref[:PIX]
        M1_excl = wm_sum + pref[PIX : 2 * PIX]
        M2_excl = wm2_sum + pref[2 * PIX :]
        dist_acc = dist_acc + jnp.sum(
            w * (m_ndc * m_ndc * A_excl + M2_excl - 2.0 * m_ndc * M1_excl),
            axis=1,
            keepdims=True,
        )
        m1_acc = m1_acc + jnp.sum(wm, axis=1, keepdims=True)
        m2_acc = m2_acc + jnp.sum(wm2, axis=1, keepdims=True)
        w_sum = w_sum + jnp.sum(w, axis=1, keepdims=True)
        wm_sum = wm_sum + jnp.sum(wm, axis=1, keepdims=True)
        wm2_sum = wm2_sum + jnp.sum(wm2, axis=1, keepdims=True)

        # Contributor index within the tile list (1-based, counts every
        # examined pair like forward.cu:364). Over-read head lanes get
        # non-positive indices but can never contribute (lane_ok masks them).
        idx1 = (chunk_i * K + lane + 1 - head).astype(jnp.float32)  # (1, K)
        contributing = w > 0.0
        n_contrib = jnp.maximum(
            n_contrib,
            jnp.max(jnp.where(contributing, idx1, 0.0), axis=1, keepdims=True),
        )

        # Median depth: last contributing pair with T (pre-update) > 0.5.
        med_mask = contributing & (logT_excl > LOG_HALF)
        chunk_best = jnp.max(
            jnp.where(med_mask, idx1, -1.0), axis=1, keepdims=True
        )  # (256,1)
        has_med = chunk_best > 0.0
        best_depth = jnp.sum(
            jnp.where(med_mask & (idx1 == chunk_best), depth_px, 0.0),
            axis=1,
            keepdims=True,
        )
        med_depth = jnp.where(has_med, best_depth, med_depth)
        med_idx = jnp.where(has_med, chunk_best, med_idx)

        # Transmittance bookkeeping.
        chunk_min_incl = jnp.min(
            jnp.where(included & (a > 0.0), logT_incl, jnp.inf),
            axis=1,
            keepdims=True,
        )
        final_logT = jnp.minimum(final_logT, chunk_min_incl)
        logT = logT_incl[:, K - 1 : K]

        return (
            chunk_i + 1,
            logT,
            acc,
            depth_acc,
            m1_acc,
            m2_acc,
            dist_acc,
            w_sum,
            wm_sum,
            wm2_sum,
            med_depth,
            med_idx,
            n_contrib,
            final_logT,
        )

    def cond(carry):
        chunk_i, logT = carry[0], carry[1]
        return (chunk_i < n_chunks) & (jnp.max(logT) >= LOG_T_STOP)

    zeros1 = jnp.zeros((PIX, 1), jnp.float32)
    zerosA = jnp.zeros((PIX, acc_channels(S)), jnp.float32)
    init = (
        jnp.int32(0),
        jnp.where(inside, 0.0, DEAD),  # logT
        zerosA,  # acc
        zeros1,  # depth
        zeros1,  # m1
        zeros1,  # m2
        zeros1,  # dist
        zeros1,  # w_sum
        zeros1,  # wm_sum
        zeros1,  # wm2_sum
        zeros1,  # med_depth
        jnp.full((PIX, 1), -1.0, jnp.float32),  # med_idx
        zeros1,  # n_contrib
        jnp.zeros((PIX, 1), jnp.float32),  # final_logT (outside pixels cropped by _unpack)
    )
    carry = jax.lax.while_loop(cond, body, init)

    # Drain the one outstanding prefetch (each body waits chunk i and starts
    # chunk i+1, so exactly one copy is in flight at exit, incl. early exit).
    exit_chunk = carry[0]

    @pl.when(n_chunks > 0)
    def _():
        slot = jax.lax.rem(exit_chunk, 2)
        off = pl.multiple_of(base + exit_chunk * K, K)
        pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(off, K)], chunk_vmem.at[slot], sem.at[slot]
        ).wait()

    (
        _,
        _,
        acc,
        depth_acc,
        m1_acc,
        m2_acc,
        dist_acc,
        _,
        _,
        _,
        med_depth,
        med_idx,
        n_contrib,
        final_logT,
    ) = carry

    final_T = jnp.exp(final_logT)
    outs = jnp.concatenate(
        [
            acc,  # color + feature + normal
            depth_acc,
            m1_acc,
            m2_acc,
            dist_acc,
            med_depth,
            final_T,
            n_contrib,
            med_idx,
        ],
        axis=1,
    )
    pad = C_OUT - outs.shape[1]
    if pad:
        outs = jnp.concatenate([outs, jnp.zeros((PIX, pad), jnp.float32)], axis=1)
    out_ref[0] = outs


def rasterize_tiles_fwd(
    payload: jax.Array,  # (C_PAD, B + 2*K_CHUNK) f32, depth-sorted per tile
    tile_start: jax.Array,  # (T+1,) int32 RAW offsets (kernel over-reads)
    tile_count: jax.Array,  # (T,) int32 valid pairs per tile
    *,
    S: int,
    grid_x: int,
    grid_y: int,
    W: int,
    H: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns (num_tiles, 256, C_OUT) per-tile outputs."""
    num_tiles = grid_x * grid_y
    C_PAD = payload_channels_padded(S)
    assert payload.shape[0] == C_PAD, (payload.shape, C_PAD)
    C_OUT = out_channels_padded(S)

    kernel = functools.partial(_fwd_kernel, S=S, grid_x=grid_x, W=W, H=H)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, PIX, C_OUT), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C_PAD, K_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, C_OUT), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, payload)
