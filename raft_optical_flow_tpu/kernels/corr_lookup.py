"""Pallas TPU kernel: windowed bilinear lookup over a materialized correlation pyramid.

Semantics parity: `core/corr.py:56-94` (CorrBlock.__call__) — for each query pixel q
and pyramid level l, bilinearly sample a (2r+1)^2 window of corr_l[q] centered at
coords(q)/2^l, zero for out-of-bounds taps, channel order k = a*(2r+1)+b for offset
(dx, dy) = (a-r, b-r).

Kernel design — *separable selector matmuls*, not gathers:

Bilinear window sampling factorizes: the weight of integer tap (x, y) for window
position (a, b) at center c is tri(x - (cx - r + a)) * tri(y - (cy - r + b)) with
tri(t) = max(0, 1 - |t|). So the whole window is

    win[q, a, b] = X[q]^T · corr[q] · Y[q],   X[q][w, a] = tri(w - (cx_q - r + a)),
                                              Y[q][h, b] = tri(h - (cy_q - r + b)),

two batched matmuls per level, vectorized over every query in the tile — MXU work
instead of per-query dynamic addressing (which Mosaic supports poorly). Taps outside
[0, W-1] x [0, H-1] never appear as rows of X/Y, which reproduces grid_sample's
zero padding exactly. The selector matrices are built from broadcasted_iota on the
VPU and live only in VMEM/registers — XLA would materialize them ([B, Q, H, K]
~14 MB/level at Sintel size) which is why this is a Pallas kernel and not an einsum.

Grid (B, Q/QT); one pallas_call per pyramid level (static shapes per level). Runs in
interpret mode automatically on CPU so tests / the multi-chip dry run share the path.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _tri_selector(centers, dim: int, radius: int):
    """Selector stack S[q, a, d] = tri(d - (centers[q] - r + a)).

    centers: [QT] fractional window centers along one axis, level units.
    Returns [QT, 2r+1, dim] fp32 — the window axis on the SUBLANE dim and the
    spatial axis on the lane dim. The untransposed [QT, dim, 2r+1] form pads
    2r+1 -> 128 lanes (8-14x VMEM and relayout waste); this way only the
    spatial dim (usually >= 64) occupies lanes.
    """
    qt = centers.shape[0]
    K = 2 * radius + 1
    d = jax.lax.broadcasted_iota(jnp.int32, (qt, K, dim), 2).astype(jnp.float32)
    a = jax.lax.broadcasted_iota(jnp.int32, (qt, K, dim), 1).astype(jnp.float32)
    t = d - (centers[:, None, None] - float(radius) + a)
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _placement(a: int, K: int, dtype):
    """One-hot placement matrix P_a[b, m] = 1 iff m == a*K + b, shape [K, K*K].

    Right-multiplying a [QT, K] window slice by P_a scatters it into lanes
    a*K..a*K+K-1 of the flattened output — the lane-merge flatten expressed as
    MXU work, which Mosaic supports where reshapes/offset-concats are rejected.
    """
    b = jax.lax.broadcasted_iota(jnp.int32, (K, K * K), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (K, K * K), 1)
    return (m == a * K + b).astype(dtype)


def _lookup_level_kernel(coords_ref, corr_ref, out_ref, *, radius: int):
    """One grid step: QT queries of one batch element at one pyramid level.

    coords_ref: VMEM [1, QT, 2] level-scaled (x, y) centers.
    corr_ref:   VMEM [1, QT, Hl, Wl] correlation rows for these queries.
    out_ref:    VMEM [1, QT, (2r+1)^2] flattened window, k = a*(2r+1)+b order.

    The output keeps the window FLAT on the lane dimension: a [QT, K, K] output
    block would be tiled T(8,128) per trailing [K, K] slab — 14x write padding at
    K=9 — and force a real (measured ~1 ms/level) XLA reshape downstream. Mosaic
    forbids lane-merging reshapes (and rejects lane-concat of offset slices), so
    the flatten is K placement matmuls: win_flat = sum_a win[:, a, :] @ P_a with
    P_a[b, a*K+b] = 1 — tiny MXU work that also normalizes the slice layouts.
    """
    Hl, Wl = corr_ref.shape[2], corr_ref.shape[3]
    K = 2 * radius + 1
    corr = corr_ref[0]
    cx = coords_ref[0, :, 0]
    cy = coords_ref[0, :, 1]

    # selectors in the volume's dtype (bf16 volumes halve the per-iteration HBM
    # traffic under the mixed-precision policy); accumulation stays fp32
    X = _tri_selector(cx, Wl, radius).astype(corr.dtype)  # [QT, K, Wl]
    Y = _tri_selector(cy, Hl, radius).astype(corr.dtype)  # [QT, K, Hl]

    # u[q, a, h] = sum_w X[q, a, w] * corr[q, h, w]
    # (intermediates are fp32: Mosaic requires 32-bit matmul accumulators)
    u = jax.lax.dot_general(
        X, corr,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # win[q, a, b] = sum_h u[q, a, h] * Y[q, b, h]  -> dx-major, reference order
    win = jax.lax.dot_general(
        u, Y.astype(u.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # One-hot placement must not round the fp32 window values when the output
    # is fp32 (fidelity/test mode) -> HIGHEST. With a bf16 output the default
    # pass's bf16 truncation is exactly the rounding the output applies anyway,
    # and HIGHEST's 6-pass tiny dots measurably slow the serving path (~7 ms).
    pp = (
        jax.lax.Precision.DEFAULT
        if out_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    flat = None
    for a in range(K):
        part = jax.lax.dot_general(
            win[:, a, :], _placement(a, K, win.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=pp,
        )
        flat = part if flat is None else flat + part
    out_ref[0] = flat.astype(out_ref.dtype)


def _lookup_level_bwd_kernel_xla_unflatten(coords_ref, g_ref, dcorr_ref, *,
                                           radius: int):
    """Backward variant consuming an XLA-unflattened [1, QT, K, K] cotangent
    (the round-2 design, kept switchable via RAFT_TPU_FLAT_BWD=0 for A/B
    measurement of the flat-lane rework — round-4 VERDICT item 2; same
    dtype-dependent precision rule and output dtype as the flat kernel)."""
    Hl, Wl = dcorr_ref.shape[2], dcorr_ref.shape[3]
    g = g_ref[0].astype(jnp.float32)  # [QT, K, K]
    cx = coords_ref[0, :, 0]
    cy = coords_ref[0, :, 1]
    X = _tri_selector(cx, Wl, radius)
    Y = _tri_selector(cy, Hl, radius)
    pp = (
        jax.lax.Precision.DEFAULT
        if dcorr_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    t = jax.lax.dot_general(
        g, Y,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=pp,
    )
    dcorr_ref[0] = jax.lax.dot_general(
        t, X,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=pp,
    ).astype(dcorr_ref.dtype)


def _lookup_level_bwd_kernel(coords_ref, g_ref, dcorr_ref, g3_ref, *, radius: int):
    """Backward: d_corr[q, h, w] = sum_{a,b} Y[q,h,b] g[q,a,b] X[q,w,a].

    coords_ref: VMEM [1, QT, 2]; g_ref: VMEM [1, QT, K*K] — the cotangent stays
    FLAT on the lane dim, exactly as the forward emits it. Unflattening in XLA
    (the round-2 design) forced a lane-split reshape of bf16[B, Q, 9, 9] whose
    14x-padded relayout copies were the largest single class in the round-3
    train-step trace (~6 copies x 0.9-1.7 ms each, BENCH.md); instead the
    K-row unflatten happens here as one-hot placement transposes into a VMEM
    scratch (g3_ref: [QT, K, K]) — the exact inverse of the forward's flatten,
    fp32 at HIGHEST so no rounding. dcorr_ref: VMEM [1, QT, Hl, Wl].
    """
    Hl, Wl = dcorr_ref.shape[2], dcorr_ref.shape[3]
    K = 2 * radius + 1
    g_flat = g_ref[0].astype(jnp.float32)  # [QT, K*K]
    # One-hot placement precision: a bf16 cotangent's values are exactly
    # bf16-representable, so DEFAULT's operand truncation is lossless and
    # skips HIGHEST's 6-pass cost on these K tiny dots; an fp32 cotangent
    # needs HIGHEST (DEFAULT would round the values).
    ppg = (
        jax.lax.Precision.DEFAULT
        if g_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    for a in range(K):
        # row a of the window: g3[:, a, :] = g_flat @ P_a^T (P_a one-hot)
        g3_ref[:, a, :] = jax.lax.dot_general(
            g_flat, _placement(a, K, jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=ppg,
        )
    g = g3_ref[:, :, :]  # [QT, K, K]
    cx = coords_ref[0, :, 0]
    cy = coords_ref[0, :, 1]
    X = _tri_selector(cx, Wl, radius)  # [QT, K, Wl]
    Y = _tri_selector(cy, Hl, radius)  # [QT, K, Hl]

    # Same dtype-dependent rule as the forward's placement: with an fp32
    # gradient (fp32 volume — training fidelity / the grad-parity gate) the
    # MXU's DEFAULT pass truncates both operands to bf16 (~7e-3 rel error on
    # real hardware, invisible in the fp32-exact interpreter — round-4 TPU
    # grad-parity catch), so run the selector contractions at HIGHEST; with a
    # bf16 volume the truncation is the output rounding anyway.
    pp = (
        jax.lax.Precision.DEFAULT
        if dcorr_ref.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    # t[q, a, h] = sum_b g[q, a, b] * Y[q, b, h]
    t = jax.lax.dot_general(
        g, Y,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=pp,
    )
    # d[q, h, w] = sum_a t[q, a, h] * X[q, a, w]
    dcorr_ref[0] = jax.lax.dot_general(
        t, X,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=pp,
    ).astype(dcorr_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _lookup_level(corr_l, coords_l, radius, qt, interpret, Hl, Wl, out_dtype):
    return _lookup_level_fwd_impl(corr_l, coords_l, radius, qt, interpret, out_dtype)


def _lookup_level_fwd_impl(
    corr_l, coords_l, radius: int, qt: int, interpret: bool, out_dtype=jnp.float32
):
    """corr_l: [B, Q, Hl, Wl] fp32/bf16; coords_l: [B, Q, 2] level-scaled.
    -> [B, Q, K^2] out_dtype (fp32 accumulation inside, one rounding at the end)."""
    B, Q, Hl, Wl = corr_l.shape
    K = 2 * radius + 1

    # ceil-div grid: Pallas masks the partial final block (padding the arrays
    # to a qt multiple instead would re-copy the whole pyramid every scan
    # iteration — measured 7 ms/call at Sintel size)
    out = pl.pallas_call(
        functools.partial(_lookup_level_kernel, radius=radius),
        grid=(B, -(-Q // qt)),
        in_specs=[
            pl.BlockSpec((1, qt, 2), lambda b, q: (b, q, 0)),
            pl.BlockSpec((1, qt, Hl, Wl), lambda b, q: (b, q, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qt, K * K), lambda b, q: (b, q, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Q, K * K), out_dtype),
        interpret=interpret,
    )(coords_l, corr_l)
    return out


def _lookup_level_fwd(corr_l, coords_l, radius, qt, interpret, Hl, Wl, out_dtype):
    out = _lookup_level_fwd_impl(corr_l, coords_l, radius, qt, interpret, out_dtype)
    # the empty array carries the primal volume dtype for the cotangent
    return out, (coords_l, jnp.zeros((0,), corr_l.dtype))


def _flat_bwd_default() -> bool:
    """Flat-lane cotangent backward (True, default) vs XLA-unflatten (False).

    RAFT_TPU_FLAT_BWD=0 selects the round-2 design for A/B benchmarking: the
    flat-lane rework was motivated by the ~6 x 0.9-1.7 ms relayout-copy class
    in the round-3 train trace but re-measured ~8% slower at crop scale in
    round 4 before the bf16-emit fix; this switch lets the decision be made
    on measurement at HEAD instead of reverting blind."""
    import os

    return os.environ.get("RAFT_TPU_FLAT_BWD", "1") != "0"


def _lookup_level_bwd(radius, qt, interpret, Hl, Wl, out_dtype, residuals, g):
    """Gradient wrt the correlation volume, as a Pallas kernel with the same
    separable-selector structure. The coords gradient is zero: RAFT stop-gradients
    coords1 before every lookup (`core/raft.py:216`), so no gradient would flow
    through it anyway; this matches the on-demand path and the reference CUDA
    kernel (which never computes a coords grad either)."""
    coords_l, dtype_token = residuals
    B, Q = coords_l.shape[:2]
    K = 2 * radius + 1

    # halve the query tile: the bwd stack (X + Y + t + g + dcorr block) is ~2x
    # the fwd's and hits the 16 MB scoped-vmem limit at qt=128/1024-wide
    qt = max(qt // 2, 32)

    # The cotangent is emitted IN the primal volume dtype: with a bf16 volume
    # (mixed-precision training) an fp32 out_shape here would (a) double the
    # dcorr write/downstream-accumulate HBM traffic and (b) make the kernel's
    # dtype-dependent precision rule always see fp32 and run the two big
    # selector contractions at HIGHEST (6 MXU passes) — measured ~8% on the
    # whole bs4 368x496 train step (BENCH.md round-4 note). fp32 volumes keep
    # fp32 + HIGHEST, which is what the on-TPU grad-parity gate checks.
    if _flat_bwd_default():
        kernel = functools.partial(_lookup_level_bwd_kernel, radius=radius)
        g_spec = pl.BlockSpec((1, qt, K * K), lambda b, q: (b, q, 0))
        scratch = [pltpu.VMEM((qt, K, K), jnp.float32)]
    else:
        # A/B variant: unflatten in XLA (lane-split reshape + its relayouts)
        g = g.reshape(B, Q, K, K)
        kernel = functools.partial(
            _lookup_level_bwd_kernel_xla_unflatten, radius=radius)
        g_spec = pl.BlockSpec((1, qt, K, K), lambda b, q: (b, q, 0, 0))
        scratch = []
    dcorr = pl.pallas_call(
        kernel,
        grid=(B, -(-Q // qt)),
        in_specs=[
            pl.BlockSpec((1, qt, 2), lambda b, q: (b, q, 0)),
            g_spec,
        ],
        out_specs=pl.BlockSpec((1, qt, Hl, Wl), lambda b, q: (b, q, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Q, Hl, Wl), dtype_token.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(coords_l, g)
    return (
        dcorr,
        jnp.zeros_like(coords_l),
    )


_lookup_level.defvjp(_lookup_level_fwd, _lookup_level_bwd)


def _placement_at(a: int, K: int, offset: int, total: int, dtype):
    """One-hot placement into a wider output: P[b, m] = 1 iff m == offset + a*K + b,
    shape [K, total] — the multi-level generalization of `_placement`."""
    b = jax.lax.broadcasted_iota(jnp.int32, (K, total), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (K, total), 1)
    return (m == offset + a * K + b).astype(dtype)


def _coarse_fused_kernel(coords_ref, *refs, radius: int, levels, total: int):
    """Levels 1..L-1 of the pyramid lookup in ONE grid step (serving path).

    The coarse levels carry 4^l x less data per query than level 0, so their
    per-level pallas_call cost is launch/grid overhead, not DMA (BENCH.md
    "coarse lookup levels ~2 ms each vs ~0.5 ms of pure DMA"). Fusing them
    into one call amortizes that overhead 3x while their block stack still
    fits VMEM comfortably (level 0 stays separate — residency for all four
    levels would force qt <= 96, the measured failure of the all-levels
    variant above).

    coords_ref: VMEM [1, QT, 2] LEVEL-0 (x, y) centers; refs = per-level corr
    blocks [1, QT, Hl, Wl] + out [1, QT, total]; `levels` = [(lvl, Hl, Wl)]
    with lvl the true pyramid level (coords scale 1/2^lvl); window k-order and
    level-concat order match the per-level kernels exactly via placement
    offsets lvl_index*K^2 + a*K.
    """
    K = 2 * radius + 1
    out_ref = refs[len(levels)]
    flat = None
    for i, (lvl, Hl, Wl) in enumerate(levels):
        corr = refs[i][0]
        scale = 1.0 / (2.0 ** lvl)
        cx = coords_ref[0, :, 0] * scale
        cy = coords_ref[0, :, 1] * scale
        X = _tri_selector(cx, Wl, radius).astype(corr.dtype)
        Y = _tri_selector(cy, Hl, radius).astype(corr.dtype)
        u = jax.lax.dot_general(
            X, corr,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        win = jax.lax.dot_general(
            u, Y.astype(u.dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # same dtype-dependent precision rule as `_lookup_level_kernel`
        pp = (
            jax.lax.Precision.DEFAULT
            if out_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )
        for a in range(K):
            part = jax.lax.dot_general(
                win[:, a, :], _placement_at(a, K, i * K * K, total, win.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=pp,
            )
            flat = part if flat is None else flat + part
    out_ref[0] = flat.astype(out_ref.dtype)


def _coarse_fused_lookup(pyramid_tail, coords_flat, radius: int, interpret: bool,
                         out_dtype, level_offset: int = 1):
    """Forward-only fused lookup over the coarse pyramid levels.

    pyramid_tail: [B, Q, Hl, Wl] volumes for levels `level_offset`..L-1
    (empty levels must be filtered by the caller). Returns [B, Q, n*K^2] in
    the same order as concatenating the per-level lookups. Serving path only
    (test_mode) — no VJP is defined; training uses the per-level custom-VJP
    kernels.
    """
    B, Q = coords_flat.shape[:2]
    K = 2 * radius + 1
    levels = [
        (level_offset + i, c.shape[2], c.shape[3])
        for i, c in enumerate(pyramid_tail)
    ]
    total = len(levels) * K * K

    # query tile from a VMEM byte budget: double-buffered blocks store the
    # TILED shapes (sublane pad to 8, lane pad to 128), which is the real
    # footprint for these narrow coarse levels
    pad = lambda v, m: -(-v // m) * m
    itemsize = jnp.dtype(pyramid_tail[0].dtype).itemsize
    bytes_per_q = sum(pad(Hl, 8) * pad(Wl, 128) for _, Hl, Wl in levels) * itemsize
    qt = int(max(64, min(512, (6 * 2**20) // (2 * bytes_per_q) // 32 * 32)))

    in_specs = [pl.BlockSpec((1, qt, 2), lambda b, q: (b, q, 0))]
    for _, Hl, Wl in levels:
        in_specs.append(pl.BlockSpec((1, qt, Hl, Wl), lambda b, q: (b, q, 0, 0)))
    return pl.pallas_call(
        functools.partial(
            _coarse_fused_kernel, radius=radius, levels=levels, total=total),
        grid=(B, -(-Q // qt)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, qt, total), lambda b, q: (b, q, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Q, total), out_dtype),
        interpret=interpret,
    )(coords_flat, *pyramid_tail)


def _fused_lookup_kernel(coords_ref, *refs, radius: int, levels: int):
    """All pyramid levels in one grid step. refs = (corr_0..corr_{L-1}, out).

    coords_ref: VMEM [1, QT, 2] level-0 (x, y); out: [1, QT, L, K, K].
    """
    corr_refs = refs[:levels]
    out_ref = refs[levels]
    for lvl in range(levels):
        corr = corr_refs[lvl][0]
        Hl, Wl = corr.shape[1], corr.shape[2]
        scale = 1.0 / (2.0**lvl)
        cx = coords_ref[0, :, 0] * scale
        cy = coords_ref[0, :, 1] * scale
        X = _tri_selector(cx, Wl, radius).astype(corr.dtype)
        Y = _tri_selector(cy, Hl, radius).astype(corr.dtype)
        u = jax.lax.dot_general(
            X, corr,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        win = jax.lax.dot_general(
            u, Y,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, lvl] = win


def corr_pyramid_lookup_pallas_fused(
    pyramid: Sequence[jax.Array],
    coords: jax.Array,
    radius: int,
    qt: int = 96,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-pallas_call variant: all levels per grid step. Forward-only.

    MEASURED SLOWER in-model than the per-level kernels (13.9 vs 17.2 pairs/s at
    the headline bench): all four level blocks resident per step force qt <= 96
    to fit the 16 MB VMEM scoped allocation, and the smaller tiles cost more in
    matmul utilization than the fusion saves in pipeline overhead. Kept as a
    documented variant; the model uses the per-level kernels."""
    if interpret is None:
        if _interpret_default():
            from raft_optical_flow_tpu.ops.corr import corr_pyramid_lookup

            return corr_pyramid_lookup(pyramid, coords, radius)
        interpret = False

    B, h, w, _ = coords.shape
    Q = h * w
    L = len(pyramid)
    K = 2 * radius + 1
    coords_flat = coords.reshape(B, Q, 2).astype(jnp.float32)

    pad_q = (-Q) % qt
    corr_ls = [
        jnp.pad(c, ((0, 0), (0, pad_q), (0, 0), (0, 0))) if pad_q else c
        for c in pyramid
    ]
    coords_p = (
        jnp.pad(coords_flat, ((0, 0), (0, pad_q), (0, 0))) if pad_q else coords_flat
    )
    Qp = Q + pad_q

    in_specs = [pl.BlockSpec((1, qt, 2), lambda b, q: (b, q, 0))]
    for c in corr_ls:
        Hl, Wl = c.shape[2], c.shape[3]
        in_specs.append(
            pl.BlockSpec((1, qt, Hl, Wl), lambda b, q: (b, q, 0, 0))
        )

    out = pl.pallas_call(
        functools.partial(_fused_lookup_kernel, radius=radius, levels=L),
        grid=(B, Qp // qt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, qt, L, K, K), lambda b, q: (b, q, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Qp, L, K, K), jnp.float32),
        interpret=interpret,
    )(coords_p, *corr_ls)
    return out[:, :Q].reshape(B, h, w, L * K * K)


def corr_pyramid_lookup_pallas(
    pyramid: Sequence[jax.Array],
    coords: jax.Array,
    radius: int,
    qt: int | None = None,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
    fuse_coarse: bool = False,
) -> jax.Array:
    """Drop-in Pallas replacement for `ops.corr.corr_pyramid_lookup`.

    pyramid: tuple of [B, Q, Hl, Wl] fp32 volumes (level 0 first).
    coords: [B, h, w, 2] level-0 pixel coords (x, y), Q = h*w row-major.
    out_dtype: window feature dtype (fp32 accumulation either way; pass bf16
      under the mixed-precision policy to skip a separate convert pass).
    fuse_coarse: run levels 1..L-1 through ONE pallas_call (amortizes the
      per-level launch/grid overhead that dominates their cost). Forward-only
      — the serving/test_mode path sets it; training keeps the per-level
      custom-VJP kernels.
    Returns [B, h, w, L*(2r+1)^2], levels concatenated coarse-last.
    """
    if interpret is None:
        if _interpret_default():
            # On CPU (tests, multi-chip dry runs) the XLA reference path is both
            # faster than the Pallas interpreter and parity-tested against this
            # kernel (tests/test_kernels.py), so delegate instead of interpreting.
            from raft_optical_flow_tpu.ops.corr import corr_pyramid_lookup

            return corr_pyramid_lookup(pyramid, coords, radius).astype(out_dtype)
        interpret = False
    B, h, w, _ = coords.shape
    coords_flat = coords.reshape(B, h * w, 2).astype(jnp.float32)

    K = 2 * radius + 1
    # Coarser levels carry 4x less data per query, so their per-grid-step DMA
    # and launch overhead dominates at a fixed tile; scale the query tile up
    # with the level (VMEM stays ~flat: block bytes are qt/4^lvl-invariant).
    # The cap keeps the lane-padded selector/intermediate stacks inside the
    # 16 MB scoped-vmem budget (bf16 intermediates allow the larger cap).
    cap = 512 if pyramid[0].dtype == jnp.bfloat16 else 256
    if qt is None:
        # bf16 level-0 blocks are half the bytes, so the tile can double
        # (measured ~3 ms/call in-model at Sintel size); fp32 at 256 overflows
        # the scoped-vmem budget with double-buffered [qt, H/8, W/8] blocks.
        qt = 256 if pyramid[0].dtype == jnp.bfloat16 else 128
    # fused-coarse applies to the contiguous non-empty coarse prefix (empty
    # tail levels — floor-mode pooling at tiny crops — keep their zeros path)
    fused_from = None
    if fuse_coarse and len(pyramid) > 2:
        tail = [
            c for c in pyramid[1:] if c.shape[2] > 0 and c.shape[3] > 0
        ]
        if len(tail) == len(pyramid) - 1:
            fused_from = 1
        elif len(tail) >= 2:
            fused_from = 1  # fuse the non-empty prefix, zeros for the rest

    outs = []
    for lvl, corr_l in enumerate(pyramid):
        Hl, Wl = corr_l.shape[2], corr_l.shape[3]
        if fused_from is not None and lvl == fused_from:
            tail = [
                c for c in pyramid[lvl:] if c.shape[2] > 0 and c.shape[3] > 0
            ]
            outs.append(
                _coarse_fused_lookup(
                    tail, coords_flat, radius, interpret, out_dtype,
                    level_offset=lvl,
                )
            )
            for c in pyramid[lvl + len(tail):]:
                outs.append(jnp.zeros((B, h * w, K * K), out_dtype))
            break
        coords_l = coords_flat / jnp.float32(2.0**lvl)
        qt_l = min(qt * 4**lvl, cap)
        if Hl == 0 or Wl == 0:
            # floor-mode pooling empties a level once h or w reaches 1 (e.g.
            # 48-pixel-high selfsup student crops: 6 -> 3 -> 1 -> 0). Every tap
            # is out of bounds, so the XLA path yields zeros; match it without
            # asking Mosaic for a zero-sized block.
            outs.append(jnp.zeros((B, h * w, K * K), out_dtype))
            continue
        outs.append(
            _lookup_level(
                corr_l, coords_l, radius, qt_l, interpret, Hl, Wl, out_dtype
            )
        )
    out = jnp.concatenate(outs, axis=-1)
    # [B, Q, L*K^2] -> [B, h, w, L*K^2]: splits the sublane dim only (layout-
    # preserving bitcast), unlike the former per-level [B, Q, K, K] windows
    return out.reshape(B, h, w, -1)
