"""Pallas TPU kernel: on-demand blockwise correlation (alt_cuda_corr equivalent).

Semantics parity: `alt_cuda_corr/correlation_kernel.cu:19-119` via
`core/corr.py:130-198` (AlternateCorrBlock) — for each query pixel q and pyramid
level l, the (2r+1)^2-window correlation

    out[q, k] = <fmap1[q], bilinear(fmap2_l, coords(q)/2^l + offset_k)> / sqrt(C)

computed directly from the feature maps: the HW x HW all-pairs volume never exists,
in HBM *or* in VMEM. This is the native-kernel replacement for the XLA `lax.map`
stand-in in corr_ondemand.py (which remains the CPU path and semantic oracle).

Kernel design (per level, grid (B, Q/QT); fmap2 resident in VMEM across query tiles):

  1. The level's fmap2 arrives zero-padded to lane-aligned width Wp and flattened to
     [Hl*Wp, C]; its BlockSpec index is constant in the query-tile grid dimension, so
     Pallas keeps it in VMEM across all Q/QT steps — one HBM read per (batch, level),
     the analogue of the CUDA kernel's shared-memory staging of fmap2
     (`correlation_kernel.cu:38-41`).
  2. Correlation rows for the tile: rows[q, h, w] = <f1[q], f2_l[h, w]> as chunked
     2-D MXU matmuls [QT, C] x [C, ch*Wp] (Mosaic rejects rank-2 x rank-3
     contractions), written into a [QT, Hl, Wp] VMEM scratch via static lane slices.
     Zero-padded columns w in [Wl, Wp) produce zero rows, which is exactly
     grid_sample's zero padding for out-of-range taps.
  3. Bilinear window sampling factorizes into two query-batched selector matmuls
     (same separable triangle-kernel formulation as kernels/corr_lookup.py):
         win[q, a, b] = sum_h Y[q, b, h] * sum_w X[q, a, w] * rows[q, h, w]
     with X[q][a, w] = tri(w - (cx_q - r + a)), tri(t) = max(0, 1 - |t|). No gathers,
     no dynamic addressing — MXU work batched over every query in the tile.

Backward (custom VJP) re-runs the same tiling with the transposed selectors:
d_rows = X^T g Y per tile, then df1 = d_rows . f2 (one kernel) and
df2 += d_rows^T . f1 accumulated across query tiles into a VMEM-resident output
block (flash-attention dK/dV pattern). The coords gradient is zero — the reference
CUDA kernel never computes it either (`correlation_kernel.cu:307`) and RAFT
stop-gradients coords before every lookup (`core/raft.py:216`).

Peak memory: the materialized path stores B * (HW)^2 * 4 bytes (~200 MB at Sintel
size, growing quadratically); this path's extra footprint is one [QT, Hl, Wp] VMEM
scratch per tile and zero HBM beyond the feature pyramid — the same trade the
reference buys with CUDA ("somewhat slower, significantly less GPU memory",
README.md:75-80), at MXU speed.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _tri_kq(centers, dim: int, radius: int, start=0):
    """Selector S[q, k, d] = tri((start + d) - (centers[q] - r + k)).

    -> [QT, K, dim] fp32. `start` offsets the d axis (streaming h-chunks); it may
    be a traced scalar.
    """
    qt = centers.shape[0]
    K = 2 * radius + 1
    k = jax.lax.broadcasted_iota(jnp.int32, (qt, K, dim), 1).astype(jnp.float32)
    d = jax.lax.broadcasted_iota(jnp.int32, (qt, K, dim), 2).astype(jnp.float32)
    t = (d + start) - (centers[:, None, None] - float(radius) + k)
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _tri_qk(centers, dim: int, radius: int, start=0):
    """Selector S[q, d, k] = tri((start + d) - (centers[q] - r + k)). -> [QT, dim, K]."""
    qt = centers.shape[0]
    K = 2 * radius + 1
    d = jax.lax.broadcasted_iota(jnp.int32, (qt, dim, K), 1).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (qt, dim, K), 2).astype(jnp.float32)
    t = (d + start) - (centers[:, None, None] - float(radius) + k)
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _rows_into_scratch(f1, f2_ref, rows_ref, Hl, Wp, precision):
    """rows_ref[q, h, w] = <f1[q], f2[h*Wp + w]> via chunked 2-D matmuls."""
    ch = max(1, min(Hl, 2048 // Wp))  # h-rows per MXU chunk (~2048 output lanes)
    for h0 in range(0, Hl, ch):
        hn = min(ch, Hl - h0)
        seg = jax.lax.dot_general(
            f1, f2_ref[0, h0 * Wp : (h0 + hn) * Wp, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [QT, hn*Wp]
        for i in range(hn):
            rows_ref[:, h0 + i, :] = seg[:, i * Wp : (i + 1) * Wp]


def _flatten_win(win, radius: int, out_dtype):
    """[QT, K, K] -> [QT, K*K] (k = a*K + b) via one-hot placement matmuls —
    the lane-merge flatten Mosaic's reshape/concat can't do (see
    corr_lookup.py). Keeping the window flat on the lane dim avoids the 14x
    tile-padded [*, K, K] output writes and the XLA reshape downstream.

    Placement precision: HIGHEST when the output is fp32 (fp32-faithful mode —
    a one-hot selection must not round the window values); DEFAULT when the
    output is bf16, where the pass's truncation is the rounding the output
    applies anyway and HIGHEST's 6-pass tiny dots cost ~7 ms/call in-model."""
    K = 2 * radius + 1
    b_i = jax.lax.broadcasted_iota(jnp.int32, (K, K * K), 0)
    m_i = jax.lax.broadcasted_iota(jnp.int32, (K, K * K), 1)
    pp = (
        jax.lax.Precision.DEFAULT
        if out_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    flat = None
    for a in range(K):
        p = (m_i == a * K + b_i).astype(win.dtype)
        part = jax.lax.dot_general(
            win[:, a, :], p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=pp,
        )
        flat = part if flat is None else flat + part
    return flat


def _fwd_level_kernel(coords_ref, f1_ref, f2_ref, out_ref, rows_ref,
                      *, radius, scale, Hl, Wp, precision, inv_sqrt_c):
    """One grid step: QT queries of one batch element at one pyramid level.

    coords_ref: VMEM [1, QT, 2] level-0 (x, y) centers (scaled by `scale` here).
    f1_ref:     VMEM [1, QT, C].
    f2_ref:     VMEM [1, Hl*Wp, C] — constant index in the query grid dim (resident).
    out_ref:    VMEM [1, QT, K*K] flat window (k = a*K + b), already 1/sqrt(C)-scaled.
    rows_ref:   VMEM scratch [QT, Hl, Wp].
    """
    f1 = f1_ref[0]
    _rows_into_scratch(f1, f2_ref, rows_ref, Hl, Wp, precision)
    cx = coords_ref[0, :, 0] * scale
    cy = coords_ref[0, :, 1] * scale
    X = _tri_kq(cx, Wp, radius)  # [QT, K, Wp]
    Y = _tri_kq(cy, Hl, radius)  # [QT, K, Hl]
    # u[q, a, h] = sum_w X[q, a, w] * rows[q, h, w]
    u = jax.lax.dot_general(
        X, rows_ref[:],
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # win[q, a, b] = sum_h u[q, a, h] * Y[q, b, h]  -> dx-major, reference order
    win = jax.lax.dot_general(
        u, Y,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    out_ref[0] = (
        _flatten_win(win, radius, out_ref.dtype) * inv_sqrt_c
    ).astype(out_ref.dtype)


def _fwd_level_stream_kernel(coords_ref, f1_ref, f2c_ref, out_ref, rows_ref,
                             *, radius, scale, CH, Wp, precision, inv_sqrt_c,
                             final_dtype):
    """Streaming variant: grid (B, nH, nQ); one h-chunk of fmap2 per step.

    Used when a level's fmap2 exceeds the VMEM residency budget (frames beyond
    ~Sintel size). The chunk block's index is constant in the inner q dimension,
    so each chunk is DMA'd once and swept over all query tiles; every (h, q)
    step writes its own PARTIAL window [1, 1, QT, K, K] (out-of-range rows
    select zero-padded fmap2 -> zero contribution), and the caller sums over the
    nH axis in XLA. Memory stays O(chunk); the cost is the nH-fold re-read of
    f1/coords and the partial buffer — feasibility at resolutions where the
    materialized volume cannot exist at all.
    """
    h0 = pl.program_id(1) * CH
    f1 = f1_ref[0]
    _rows_into_scratch(f1, f2c_ref, rows_ref, CH, Wp, precision)
    cx = coords_ref[0, :, 0] * scale
    cy = coords_ref[0, :, 1] * scale
    X = _tri_kq(cx, Wp, radius)            # [QT, K, Wp]
    Y = _tri_kq(cy, CH, radius, start=h0)  # [QT, K, CH] (global row offsets)
    u = jax.lax.dot_general(
        X, rows_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    win = jax.lax.dot_general(
        u, Y, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # partials stay fp32 for the nH accumulation; placement precision follows
    # the FINAL output dtype
    out_ref[0, 0] = (
        _flatten_win(win, radius, final_dtype) * inv_sqrt_c
    ).astype(out_ref.dtype)


def _unflatten_g(g_ref, g3_ref, radius: int,
                 precision=jax.lax.Precision.HIGHEST):
    """[1, QT, K*K] flat cotangent -> [QT, K, K] (a, b) VMEM scratch — the exact
    inverse of _flatten_win, as one-hot placement transposes (g3[:, a, :] =
    g_flat @ P_a^T). Doing this unflatten in XLA instead (the round-2 design)
    materializes a [B, Q, K, K] array whose (8, 128)-tiled layout pads K=9 ->
    128 lanes 14x — measured as the largest copy class in the round-3
    train-step trace. Placement precision follows the path's policy: HIGHEST
    in fp32-faithful mode (a one-hot selection must not round); under the
    bf16 policy (precision=DEFAULT) the selector dots consuming g3 truncate
    their operands to bf16 anyway, so a DEFAULT placement is
    rounding-equivalent and skips HIGHEST's 6-pass cost on these K tiny
    dots."""
    K = 2 * radius + 1
    b_i = jax.lax.broadcasted_iota(jnp.int32, (K, K * K), 0)
    m_i = jax.lax.broadcasted_iota(jnp.int32, (K, K * K), 1)
    g_flat = g_ref[0].astype(jnp.float32)  # [QT, K*K]
    for a in range(K):
        p = (m_i == a * K + b_i).astype(jnp.float32)
        g3_ref[:, a, :] = jax.lax.dot_general(
            g_flat, p, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    return g3_ref[:, :, :]


def _drows_into_scratch(coords_ref, g, drows_ref, *, radius, scale, Hl, Wp,
                        precision, h_start=0):
    """drows_ref[q, h*Wp+w] = sum_{a,b} X[q,w,a] Y[q,h,b] g[q,a,b] (flattened).

    g: [QT, K, K] (a, b) value (unflattened from the lane-flat cotangent by
    _unflatten_g in the caller)."""
    cx = coords_ref[0, :, 0] * scale
    cy = coords_ref[0, :, 1] * scale
    X = _tri_qk(cx, Wp, radius)                   # [QT, Wp, K]
    Y = _tri_qk(cy, Hl, radius, start=h_start)    # [QT, Hl(chunk), K]
    # t[q, h, a] = sum_b Y[q, h, b] * g[q, a, b]
    t = jax.lax.dot_general(
        Y, g, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    # d3[q, h, w] = sum_a t[q, h, a] * X[q, w, a]
    d3 = jax.lax.dot_general(
        t, X, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision,
    )
    for h in range(Hl):
        drows_ref[:, h * Wp : (h + 1) * Wp] = d3[:, h, :]


def _bwd_df1_kernel(coords_ref, g_ref, f2_ref, df1_ref, drows_ref, g3_ref,
                    *, radius, scale, Hl, Wp, precision):
    """df1[q, c] = sum_{hw} d_rows[q, hw] * f2[hw, c]. g_ref: [1, QT, K*K] flat."""
    g = _unflatten_g(g_ref, g3_ref, radius, precision)
    _drows_into_scratch(coords_ref, g, drows_ref,
                        radius=radius, scale=scale, Hl=Hl, Wp=Wp,
                        precision=precision)
    df1_ref[0] = jax.lax.dot_general(
        drows_ref[:], f2_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _bwd_df2_kernel(coords_ref, g_ref, f1_ref, df2_ref, drows_ref, g3_ref,
                    *, radius, scale, Hl, Wp, precision):
    """df2[hw, c] += sum_q d_rows[q, hw] * f1[q, c], accumulated across q tiles.

    The accumulation runs in h-row chunks written straight into the (VMEM-resident)
    output block — one full-size `contrib` value would double the block's footprint
    and blow the 16 MB VMEM scope at level-0 Sintel sizes.
    """
    g = _unflatten_g(g_ref, g3_ref, radius, precision)
    _drows_into_scratch(coords_ref, g, drows_ref,
                        radius=radius, scale=scale, Hl=Hl, Wp=Wp,
                        precision=precision)
    f1 = f1_ref[0]
    first = pl.program_id(1) == 0
    ch = max(1, min(Hl, 2048 // Wp))  # h-rows per chunk (~2 MB fp32 at C=256)
    for h0 in range(0, Hl, ch):
        hn = min(ch, Hl - h0)
        sl = slice(h0 * Wp, (h0 + hn) * Wp)
        contrib = jax.lax.dot_general(
            drows_ref[:, sl], f1,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [hn*Wp, C]

        @pl.when(first)
        def _():
            df2_ref[0, sl, :] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            df2_ref[0, sl, :] = df2_ref[0, sl, :] + contrib


def _bwd_df1_stream_kernel(coords_ref, g_ref, f2c_ref, df1p_ref, drows_ref,
                           g3_ref, *, radius, scale, CH, Wp, precision):
    """Streaming df1: grid (B, nH, nQ); partial df1 per h-chunk, summed in XLA."""
    h0 = pl.program_id(1) * CH
    g = _unflatten_g(g_ref, g3_ref, radius, precision)
    _drows_into_scratch(coords_ref, g, drows_ref,
                        radius=radius, scale=scale, Hl=CH, Wp=Wp,
                        precision=precision, h_start=h0)
    df1p_ref[0, 0] = jax.lax.dot_general(
        drows_ref[:], f2c_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _bwd_df2_stream_kernel(coords_ref, g_ref, f1_ref, df2c_ref, drows_ref,
                           g3_ref, *, radius, scale, CH, Wp, precision):
    """Streaming df2: grid (B, nH, nQ), q innermost; the [1, CH*Wp, C] chunk
    output block is VMEM-resident across the q sweep and accumulated."""
    h0 = pl.program_id(1) * CH
    g = _unflatten_g(g_ref, g3_ref, radius, precision)
    _drows_into_scratch(coords_ref, g, drows_ref,
                        radius=radius, scale=scale, Hl=CH, Wp=Wp,
                        precision=precision, h_start=h0)
    f1 = f1_ref[0]
    first = pl.program_id(2) == 0
    ch = max(1, min(CH, 2048 // Wp))
    for c0 in range(0, CH, ch):
        cn = min(ch, CH - c0)
        sl = slice(c0 * Wp, (c0 + cn) * Wp)
        contrib = jax.lax.dot_general(
            drows_ref[:, sl], f1,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

        @pl.when(first)
        def _():
            df2c_ref[0, sl, :] = contrib

        @pl.when(jnp.logical_not(first))
        def _():
            df2c_ref[0, sl, :] = df2c_ref[0, sl, :] + contrib


def _pad_q(x, qt):
    """[B, Q, ...] zero-padded so Q divides qt."""
    pad = (-x.shape[1]) % qt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x


_RESIDENT_BUDGET = 8 * 2**20  # max fmap2 level bytes kept VMEM-resident
_CHUNK_BUDGET = 3 * 2**20     # streaming h-chunk bytes


def _level_geometry(f2):
    """(Hl, Wl, Wp, CH, nH): CH == Hl => resident fast path, else h-streaming."""
    B, Hl, Wl, C = f2.shape
    Wp = _ceil_to(Wl, 128)
    if Hl * Wp * C * 4 <= _RESIDENT_BUDGET:
        return Hl, Wl, Wp, Hl, 1
    CH = max(1, _CHUNK_BUDGET // (Wp * C * 4))
    nH = -(-Hl // CH)
    return Hl, Wl, Wp, CH, nH


def _flatten_f2(f2, Wp, Hpad=None):
    """[B, Hl, Wl, C] -> [B, Hpad*Wp, C] fp32, zero-padded (XLA side, free).

    Zero-padded rows/columns yield zero correlation rows, which reproduces
    grid_sample's zero padding for out-of-range taps exactly.
    """
    B, Hl, Wl, C = f2.shape
    Hpad = Hl if Hpad is None else Hpad
    f2p = jnp.pad(
        f2.astype(jnp.float32),
        ((0, 0), (0, Hpad - Hl), (0, Wp - Wl), (0, 0)),
    )
    return f2p.reshape(B, Hpad * Wp, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ondemand_pallas(fmap1, fmap2_pyramid, coords, radius, qt, qt_bwd,
                     precision, interpret, out_dtype):
    return _fwd_impl(
        fmap1, fmap2_pyramid, coords, radius, qt, precision, interpret, out_dtype
    )


def _fwd_impl(fmap1, fmap2_pyramid, coords, radius, qt, precision, interpret,
              out_dtype=jnp.float32):
    B, h, w, C = fmap1.shape
    Q = h * w
    K = 2 * radius + 1
    inv_sqrt_c = float(C) ** -0.5
    f1 = _pad_q(fmap1.reshape(B, Q, C).astype(jnp.float32), qt)
    cf = _pad_q(coords.reshape(B, Q, 2).astype(jnp.float32), qt)
    Qp = f1.shape[1]

    outs = []
    for lvl, f2 in enumerate(fmap2_pyramid):
        Hl, Wl, Wp, CH, nH = _level_geometry(f2)
        if nH == 1:
            f2flat = _flatten_f2(f2, Wp)
            out = pl.pallas_call(
                functools.partial(
                    _fwd_level_kernel, radius=radius, scale=0.5**lvl,
                    Hl=Hl, Wp=Wp, precision=precision, inv_sqrt_c=inv_sqrt_c,
                ),
                grid=(B, Qp // qt),
                in_specs=[
                    pl.BlockSpec((1, qt, 2), lambda b, q: (b, q, 0)),
                    pl.BlockSpec((1, qt, C), lambda b, q: (b, q, 0)),
                    pl.BlockSpec((1, Hl * Wp, C), lambda b, q: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, qt, K * K), lambda b, q: (b, q, 0)),
                out_shape=jax.ShapeDtypeStruct((B, Qp, K * K), out_dtype),
                scratch_shapes=[pltpu.VMEM((qt, Hl, Wp), jnp.float32)],
                interpret=interpret,
            )(cf, f1, f2flat)
        else:
            # partials accumulate over nH in fp32; cast after the sum
            f2flat = _flatten_f2(f2, Wp, Hpad=nH * CH)
            partials = pl.pallas_call(
                functools.partial(
                    _fwd_level_stream_kernel, radius=radius, scale=0.5**lvl,
                    CH=CH, Wp=Wp, precision=precision, inv_sqrt_c=inv_sqrt_c,
                    final_dtype=out_dtype,
                ),
                grid=(B, nH, Qp // qt),
                in_specs=[
                    pl.BlockSpec((1, qt, 2), lambda b, h, q: (b, q, 0)),
                    pl.BlockSpec((1, qt, C), lambda b, h, q: (b, q, 0)),
                    pl.BlockSpec((1, CH * Wp, C), lambda b, h, q: (b, h, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, qt, K * K), lambda b, h, q: (b, h, q, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((B, nH, Qp, K * K), jnp.float32),
                scratch_shapes=[pltpu.VMEM((qt, CH, Wp), jnp.float32)],
                interpret=interpret,
            )(cf, f1, f2flat)
            out = jnp.sum(partials, axis=1).astype(out_dtype)
        outs.append(out[:, :Q])

    res = jnp.concatenate(outs, axis=-1)
    return res.reshape(B, h, w, len(fmap2_pyramid) * K * K)


def _ondemand_fwd(fmap1, fmap2_pyramid, coords, radius, qt, qt_bwd,
                  precision, interpret, out_dtype):
    out = _ondemand_pallas(fmap1, fmap2_pyramid, coords, radius, qt, qt_bwd,
                           precision, interpret, out_dtype)
    return out, (fmap1, fmap2_pyramid, coords)


def _ondemand_bwd(radius, qt, qt_bwd, precision, interpret, out_dtype,
                  residuals, g):
    fmap1, fmap2_pyramid, coords = residuals
    B, h, w, C = fmap1.shape
    Q = h * w
    K = 2 * radius + 1
    scale = 1.0 / jnp.sqrt(jnp.float32(C))

    f1 = _pad_q(fmap1.reshape(B, Q, C).astype(jnp.float32), qt_bwd)
    cf = _pad_q(coords.reshape(B, Q, 2).astype(jnp.float32), qt_bwd)
    gf = _pad_q((g.reshape(B, Q, -1) * scale).astype(jnp.float32), qt_bwd)
    Qp = f1.shape[1]

    df1 = jnp.zeros((B, Qp, C), jnp.float32)
    df2s = []
    for lvl, f2 in enumerate(fmap2_pyramid):
        Hl, Wl, Wp, CH, nH = _level_geometry(f2)
        # stays lane-FLAT [B, Qp, K*K]: the kernels unflatten in VMEM
        # (_unflatten_g) — an XLA reshape to [B, Qp, K, K] here tile-pads 14x
        g_l = gf[..., lvl * K * K : (lvl + 1) * K * K]

        if nH == 1:
            f2flat = _flatten_f2(f2, Wp)
            common = dict(radius=radius, scale=0.5**lvl, Hl=Hl, Wp=Wp,
                          precision=precision)
            df1_l = pl.pallas_call(
                functools.partial(_bwd_df1_kernel, **common),
                grid=(B, Qp // qt_bwd),
                in_specs=[
                    pl.BlockSpec((1, qt_bwd, 2), lambda b, q: (b, q, 0)),
                    pl.BlockSpec((1, qt_bwd, K * K), lambda b, q: (b, q, 0)),
                    pl.BlockSpec((1, Hl * Wp, C), lambda b, q: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, qt_bwd, C), lambda b, q: (b, q, 0)),
                out_shape=jax.ShapeDtypeStruct((B, Qp, C), jnp.float32),
                scratch_shapes=[pltpu.VMEM((qt_bwd, Hl * Wp), jnp.float32),
                pltpu.VMEM((qt_bwd, K, K), jnp.float32)],
                interpret=interpret,
            )(cf, g_l, f2flat)

            df2p = pl.pallas_call(
                functools.partial(_bwd_df2_kernel, **common),
                grid=(B, Qp // qt_bwd),
                in_specs=[
                    pl.BlockSpec((1, qt_bwd, 2), lambda b, q: (b, q, 0)),
                    pl.BlockSpec((1, qt_bwd, K * K), lambda b, q: (b, q, 0)),
                    pl.BlockSpec((1, qt_bwd, C), lambda b, q: (b, q, 0)),
                ],
                out_specs=pl.BlockSpec((1, Hl * Wp, C), lambda b, q: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, Hl * Wp, C), jnp.float32),
                scratch_shapes=[pltpu.VMEM((qt_bwd, Hl * Wp), jnp.float32),
                pltpu.VMEM((qt_bwd, K, K), jnp.float32)],
                interpret=interpret,
            )(cf, g_l, f1)
            df2_full = df2p.reshape(B, Hl, Wp, C)
        else:
            f2flat = _flatten_f2(f2, Wp, Hpad=nH * CH)
            common = dict(radius=radius, scale=0.5**lvl, CH=CH, Wp=Wp,
                          precision=precision)
            df1_parts = pl.pallas_call(
                functools.partial(_bwd_df1_stream_kernel, **common),
                grid=(B, nH, Qp // qt_bwd),
                in_specs=[
                    pl.BlockSpec((1, qt_bwd, 2), lambda b, h, q: (b, q, 0)),
                    pl.BlockSpec((1, qt_bwd, K * K), lambda b, h, q: (b, q, 0)),
                    pl.BlockSpec((1, CH * Wp, C), lambda b, h, q: (b, h, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, qt_bwd, C), lambda b, h, q: (b, h, q, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((B, nH, Qp, C), jnp.float32),
                scratch_shapes=[pltpu.VMEM((qt_bwd, CH * Wp), jnp.float32),
                pltpu.VMEM((qt_bwd, K, K), jnp.float32)],
                interpret=interpret,
            )(cf, g_l, f2flat)
            df1_l = jnp.sum(df1_parts, axis=1)

            df2p = pl.pallas_call(
                functools.partial(_bwd_df2_stream_kernel, **common),
                grid=(B, nH, Qp // qt_bwd),
                in_specs=[
                    pl.BlockSpec((1, qt_bwd, 2), lambda b, h, q: (b, q, 0)),
                    pl.BlockSpec((1, qt_bwd, K * K), lambda b, h, q: (b, q, 0)),
                    pl.BlockSpec((1, qt_bwd, C), lambda b, h, q: (b, q, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, CH * Wp, C), lambda b, h, q: (b, h, 0)
                ),
                out_shape=jax.ShapeDtypeStruct((B, nH * CH * Wp, C), jnp.float32),
                scratch_shapes=[pltpu.VMEM((qt_bwd, CH * Wp), jnp.float32),
                pltpu.VMEM((qt_bwd, K, K), jnp.float32)],
                interpret=interpret,
            )(cf, g_l, f1)
            df2_full = df2p.reshape(B, nH * CH, Wp, C)[:, :Hl]

        df1 = df1 + df1_l
        df2s.append(df2_full[:, :, :Wl].astype(f2.dtype))

    df1 = df1[:, :Q].reshape(B, h, w, C).astype(fmap1.dtype)
    return df1, tuple(df2s), jnp.zeros_like(coords)


_ondemand_pallas.defvjp(_ondemand_fwd, _ondemand_bwd)


def ondemand_corr_pyramid_pallas(
    fmap1: jax.Array,
    fmap2_pyramid: Sequence[jax.Array],
    coords: jax.Array,
    radius: int,
    qt: int = 64,
    qt_bwd: int = 32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> jax.Array:
    """On-demand multi-level windowed correlation, Pallas TPU kernels (fwd + VJP).

    fmap1: [B, h, w, C]; fmap2_pyramid: tuple of [B, Hl, Wl, C] (level 0 = 1/8 res);
    coords: [B, h, w, 2] level-0 pixel coords (x, y). Returns [B, h, w, L*(2r+1)^2].
    qt / qt_bwd: query-tile sizes (bounded by VMEM: the level-0 fmap2 block plus the
    [qt, Hl, Wp] rows scratch must fit the ~16 MB scope).
    precision: MXU precision for the feature contractions (HIGHEST = fp32-faithful
    like the reference's fp32-only CUDA kernel; DEFAULT = bf16 passes, ~6x faster,
    used under the bf16 policy like the materialized volume path).
    """
    return _ondemand_pallas(
        fmap1, tuple(fmap2_pyramid), coords, radius, qt, qt_bwd, precision,
        bool(interpret), out_dtype,
    )
