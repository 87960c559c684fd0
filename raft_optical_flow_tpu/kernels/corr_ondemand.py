"""On-demand blockwise correlation (alt_cuda_corr equivalent) — XLA path + dispatcher.

The native TPU implementation is the Pallas kernel set in corr_ondemand_pallas.py;
this module keeps the XLA blockwise formulation as the CPU path and the semantic
oracle for kernel tests, and `ondemand_corr_pyramid` dispatches between them.

Semantics parity: `alt_cuda_corr/correlation_kernel.cu:19-119` via
`core/corr.py:130-198` (AlternateCorrBlock) — for each query pixel q and pyramid
level l, compute the (2r+1)^2-window correlation

    out[q, k] = <fmap1[q], bilinear(fmap2_l, coords(q)/2^l + offset_k)> / sqrt(C)

directly from the feature maps, never materializing the HW x HW all-pairs volume.
Bilinearly interpolating fmap2 then correlating equals bilinearly interpolating the
correlation values (the CUDA kernel's 4-tap scatter), since interpolation is linear
and channel-independent. Out-of-bounds taps contribute zero; the coords gradient is
zero (the reference never computes it either, `correlation_kernel.cu:307`).

Design — flash-attention-style blockwise recompute, built from MXU matmuls:

  1. Tile the query axis (lax.scan over Q/QT tiles). Per tile and level, compute the
     full correlation rows  rows[q, h, w] = <f1[q], f2_l[h, w]>  as ONE matmul
     [QT, C] x [C, Hl*Wl] — MXU work, it lives only for the duration of the tile.
  2. Bilinear window sampling factorizes into two selector matmuls:
         win[q, a, b] = sum_{h,w} X[q, w, a] * Y[q, h, b] * rows[q, h, w]
     with X[q][w, a] = tri(w - (cx_q - r + a)), tri(t) = max(0, 1 - |t|), and Y the
     same along y. Taps outside the level never appear as selector rows, which is
     exactly grid_sample's zero padding. No gathers, no dynamic addressing.
  3. Backward (custom VJP) runs the same tiling in reverse: d_rows = X g Y^T per
     tile (separable again), then df1 = d_rows . f2 and df2 += d_rows^T . f1 —
     recompute instead of storing, so residual memory stays O(QT) not O(Q * HW).

Peak memory per tile: QT * Hl * Wl * 4 bytes (3.6 MB at Sintel level 0, QT=128) vs
B * HW * HW * 4 for the materialized volume (~200 MB) — the same trade the reference
buys with its CUDA kernel ("somewhat slower, significantly less GPU memory",
README.md:75-80).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _tri_selector(centers: jax.Array, dim: int, radius: int) -> jax.Array:
    """S[..., d, a] = tri(d - (centers[...] - r + a)); centers: [...]. -> [..., dim, K]."""
    K = 2 * radius + 1
    d = jnp.arange(dim, dtype=jnp.float32)
    a = jnp.arange(K, dtype=jnp.float32)
    t = d[..., :, None] - (centers[..., None, None] - float(radius) + a)
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _tile_windows(f1_t, c_t, fmap2_pyramid, radius):
    """Forward windows for one query tile.

    f1_t: [B, QT, C]; c_t: [B, QT, 2] level-0 coords. -> [B, QT, L*K^2] (unnormalized).
    """
    K = 2 * radius + 1
    outs = []
    for lvl, f2 in enumerate(fmap2_pyramid):
        B, Hl, Wl, C = f2.shape
        rows = jnp.einsum(
            "bqc,bhwc->bqhw", f1_t, f2, precision=jax.lax.Precision.HIGHEST
        )
        cx = c_t[..., 0] / (2.0**lvl)
        cy = c_t[..., 1] / (2.0**lvl)
        X = _tri_selector(cx, Wl, radius)  # [B, QT, Wl, K]
        Y = _tri_selector(cy, Hl, radius)  # [B, QT, Hl, K]
        u = jnp.einsum("bqwa,bqhw->bqah", X, rows, precision=jax.lax.Precision.HIGHEST)
        win = jnp.einsum("bqah,bqhk->bqak", u, Y, precision=jax.lax.Precision.HIGHEST)
        outs.append(win.reshape(win.shape[0], win.shape[1], K * K))
    return jnp.concatenate(outs, axis=-1)


def _tile_windows_bwd(f1_t, c_t, g_t, fmap2_pyramid, radius):
    """Backward for one tile: returns (df1_t, [df2_l ...])."""
    K = 2 * radius + 1
    df1 = jnp.zeros_like(f1_t)
    df2s = []
    for lvl, f2 in enumerate(fmap2_pyramid):
        B, Hl, Wl, C = f2.shape
        g_l = g_t[..., lvl * K * K : (lvl + 1) * K * K].reshape(
            g_t.shape[0], g_t.shape[1], K, K
        )  # [B, QT, a, b]
        cx = c_t[..., 0] / (2.0**lvl)
        cy = c_t[..., 1] / (2.0**lvl)
        X = _tri_selector(cx, Wl, radius)
        Y = _tri_selector(cy, Hl, radius)
        # d_rows[q, h, w] = sum_{a,k} X[q,w,a] Y[q,h,k] g[q,a,k]
        t = jnp.einsum("bqak,bqhk->bqah", g_l, Y, precision=jax.lax.Precision.HIGHEST)
        d_rows = jnp.einsum(
            "bqah,bqwa->bqhw", t, X, precision=jax.lax.Precision.HIGHEST
        )
        df1 = df1 + jnp.einsum(
            "bqhw,bhwc->bqc", d_rows, f2, precision=jax.lax.Precision.HIGHEST
        )
        df2s.append(
            jnp.einsum("bqhw,bqc->bhwc", d_rows, f1_t, precision=jax.lax.Precision.HIGHEST)
        )
    return df1, df2s


def _tile_q(x, qt):
    """[B, Q, ...] -> [nt, B, qt, ...] with zero padding."""
    B, Q = x.shape[:2]
    pad = (-Q) % qt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    nt = (Q + pad) // qt
    return x.reshape(B, nt, qt, *x.shape[2:]).swapaxes(0, 1), nt


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ondemand(fmap1, fmap2_pyramid, coords, radius, qt):
    return _ondemand_forward(fmap1, fmap2_pyramid, coords, radius, qt)


def _ondemand_forward(fmap1, fmap2_pyramid, coords, radius, qt):
    B, h, w, C = fmap1.shape
    Q = h * w
    L = len(fmap2_pyramid)
    K2 = (2 * radius + 1) ** 2
    f1 = fmap1.reshape(B, Q, C).astype(jnp.float32)
    cf = coords.reshape(B, Q, 2).astype(jnp.float32)
    f1_t, nt = _tile_q(f1, qt)
    c_t, _ = _tile_q(cf, qt)
    f2s = tuple(f.astype(jnp.float32) for f in fmap2_pyramid)

    out = jax.lax.map(
        lambda args: _tile_windows(args[0], args[1], f2s, radius), (f1_t, c_t)
    )  # [nt, B, qt, L*K2]
    out = out.swapaxes(0, 1).reshape(B, nt * qt, L * K2)[:, :Q]
    return out.reshape(B, h, w, L * K2) / jnp.sqrt(jnp.float32(C))


def _ondemand_fwd(fmap1, fmap2_pyramid, coords, radius, qt):
    out = _ondemand(fmap1, fmap2_pyramid, coords, radius, qt)
    return out, (fmap1, fmap2_pyramid, coords)


def _ondemand_bwd(radius, qt, residuals, g):
    fmap1, fmap2_pyramid, coords = residuals
    B, h, w, C = fmap1.shape
    Q = h * w
    scale = 1.0 / jnp.sqrt(jnp.float32(C))
    f1 = fmap1.reshape(B, Q, C).astype(jnp.float32)
    cf = coords.reshape(B, Q, 2).astype(jnp.float32)
    gf = (g.reshape(B, Q, -1) * scale).astype(jnp.float32)
    f1_t, nt = _tile_q(f1, qt)
    c_t, _ = _tile_q(cf, qt)
    g_t, _ = _tile_q(gf, qt)
    f2s = tuple(f.astype(jnp.float32) for f in fmap2_pyramid)

    def step(carry, args):
        df2s = carry
        f1_i, c_i, g_i = args
        df1_i, d2s = _tile_windows_bwd(f1_i, c_i, g_i, f2s, radius)
        return tuple(a + b for a, b in zip(df2s, d2s)), df1_i

    init = tuple(jnp.zeros_like(f) for f in f2s)
    df2s, df1_t = jax.lax.scan(step, init, (f1_t, c_t, g_t))
    df1 = df1_t.swapaxes(0, 1).reshape(B, nt * (f1_t.shape[2]), C)[:, :Q]
    df1 = df1.reshape(B, h, w, C).astype(fmap1.dtype)
    df2s = tuple(d.astype(f.dtype) for d, f in zip(df2s, fmap2_pyramid))
    return df1, df2s, jnp.zeros_like(coords)


_ondemand.defvjp(_ondemand_fwd, _ondemand_bwd)


def _ondemand_xla(fmap1, fmap2_pyramid, coords, radius):
    """Gather-based sampling formulation — semantic oracle for tests."""
    from raft_optical_flow_tpu.ops.grid import bilinear_sampler

    B, h, w, C = fmap1.shape
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    ox = jnp.repeat(d, 2 * r + 1)
    oy = jnp.tile(d, 2 * r + 1)

    outs = []
    for lvl, f2 in enumerate(fmap2_pyramid):
        c = coords / (2.0**lvl)
        pts = jnp.stack([c[..., 0:1] + ox, c[..., 1:2] + oy], axis=-1)
        sampled = bilinear_sampler(f2, pts, padding="zeros")
        outs.append(
            jnp.einsum("bhwc,bhwkc->bhwk", fmap1, sampled,
                       precision=jax.lax.Precision.HIGHEST)
        )
    return jnp.concatenate(outs, axis=-1) / jnp.sqrt(jnp.float32(C))


def ondemand_corr_pyramid(
    fmap1: jax.Array,
    fmap2_pyramid: Sequence[jax.Array],
    coords: jax.Array,
    radius: int,
    qt: int | None = None,
    qt_bwd: int | None = None,
    interpret: bool | None = None,
    impl: str | None = None,
    precision=None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """On-demand multi-level windowed correlation (dispatcher).

    fmap1: [B, h, w, C]; fmap2_pyramid: tuple of [B, Hl, Wl, C] (level 0 =
    feature-map, i.e. 1/8-image, resolution); coords: [B, h, w, 2] level-0 pixel
    coords. Returns [B, h, w, L*(2r+1)^2].

    qt is the query-tile size, honored on both paths (Pallas kernel tile /
    XLA block); qt_bwd additionally tunes the Pallas backward tile. None keeps
    each implementation's tuned default (Pallas 64/32, XLA 128).

    Dispatch: on TPU the native Pallas kernels (corr_ondemand_pallas.py, fwd +
    custom VJP); on CPU this module's XLA blockwise implementation (also the
    semantic oracle for the kernel tests). interpret=True forces the Pallas
    kernels in interpreter mode (kernel-logic tests on CPU); impl='xla' forces
    the XLA path on any backend.
    """
    if impl is None:
        if interpret:
            impl = "pallas"
        else:
            impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl == "pallas":
        from raft_optical_flow_tpu.kernels.corr_ondemand_pallas import (
            ondemand_corr_pyramid_pallas,
        )

        kwargs = {} if precision is None else {"precision": precision}
        if qt is not None:
            kwargs["qt"] = qt
        if qt_bwd is not None:
            kwargs["qt_bwd"] = qt_bwd
        return ondemand_corr_pyramid_pallas(
            fmap1, tuple(fmap2_pyramid), coords, radius,
            interpret=bool(interpret), out_dtype=out_dtype, **kwargs,
        )
    return _ondemand(
        fmap1, tuple(fmap2_pyramid), coords, radius, qt if qt is not None else 128
    ).astype(out_dtype)
