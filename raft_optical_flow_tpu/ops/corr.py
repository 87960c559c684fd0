"""All-pairs correlation volume, pyramid, and windowed lookup (XLA reference path).

Parity targets:
  - `core/corr.py:96-127` — all-pairs volume corr[b, q, u, v] = <fmap1[b,q,:], fmap2[b,u,v,:]>
    / sqrt(C), where q indexes frame-1 pixels row-major.
  - `core/corr.py:25-54` — 4-level pyramid by 2x2/stride-2 average pooling (floor sizes).
  - `core/corr.py:56-94` — lookup: at each level sample a (2r+1)^2 window centered at
    coords/2^level with bilinear, zero-padded taps. NOTE the reference's window channel
    order: channel k = a*(2r+1)+b samples at offset (dx=a-r, dy=b-r) — the *first*
    window axis varies x. Trained weights depend on this order; we preserve it.

TPU notes: the volume is a single [B, HW, HW] matmul (MXU-friendly); the lookup is a
vectorized gather. A Pallas kernel (`kernels/corr_lookup.py`) replaces the gather on
the hot path; this module is the semantic reference and fallback.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def all_pairs_correlation(
    fmap1: jax.Array, fmap2: jax.Array, precision=jax.lax.Precision.HIGHEST
) -> jax.Array:
    """corr[b, q, u, v] for all pairs. fmap1/fmap2: [B, H, W, C] -> [B, H*W, H, W]."""
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C).astype(jnp.float32)
    f2 = fmap2.reshape(B, H * W, C).astype(jnp.float32)
    corr = jnp.einsum("bqc,bpc->bqp", f1, f2, precision=precision)
    corr = corr / jnp.sqrt(jnp.float32(C))
    return corr.reshape(B, H * W, H, W)


def avg_pool2x2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool over the last two spatial dims of [..., H, W].

    Matches torch `F.avg_pool2d(x, 2, stride=2)` floor-mode sizing (odd trailing
    rows/cols dropped).
    """
    *lead, H, W = x.shape
    H2, W2 = H // 2, W // 2
    x = x[..., : 2 * H2, : 2 * W2]
    x = x.reshape(*lead, H2, 2, W2, 2)
    return x.mean(axis=(-3, -1))


def build_corr_pyramid(corr: jax.Array, num_levels: int = 4) -> Tuple[jax.Array, ...]:
    """Pyramid of [B, Q, H_l, W_l] volumes; level 0 is the input."""
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2x2(corr)
        pyramid.append(corr)
    return tuple(pyramid)


def build_corr_pyramid_from_fmaps(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, ...]:
    """Correlation pyramid computed as one matmul PER LEVEL against pooled fmap2.

    Mathematically identical to pooling the volume (`core/corr.py:47-54`): average
    pooling corr over the target coordinates commutes with the dot product because
    correlation is linear in fmap2 —
        avgpool_{u,v}(<f1[q], f2[u,v]>) = <f1[q], avgpool_{u,v}(f2)[u', v']>.
    Pooling the [B, Q, H, W] volume costs ~250 MB of HBM traffic at Sintel size;
    pooling fmap2 first costs ~10 MB and turns each level into a small MXU matmul.

    fmap1/fmap2: [B, H, W, C]. Returns levels of [B, H*W, H_l, W_l].
    """
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C).astype(jnp.float32)
    scale = 1.0 / jnp.sqrt(jnp.float32(C))

    pyramid = []
    f2 = fmap2
    for lvl in range(num_levels):
        Hl, Wl = f2.shape[1:3]
        corr_l = jnp.einsum(
            "bqc,bpc->bqp",
            f1,
            f2.reshape(B, Hl * Wl, C).astype(jnp.float32),
            precision=precision,
        )
        pyramid.append(corr_l.reshape(B, H * W, Hl, Wl) * scale)
        if lvl + 1 < num_levels:
            f2 = avg_pool2x2(f2.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    return tuple(pyramid)


def _window_offsets(radius: int, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """(ox, oy) flattened window offsets in the reference channel order.

    Channel k = a*(2r+1)+b  ->  (dx, dy) = (a-r, b-r): first axis varies x
    (`core/corr.py:77-84` stacks meshgrid(dy, dx) and adds [dy, dx] onto [x, y]).
    """
    r = radius
    d = jnp.arange(-r, r + 1, dtype=dtype)
    ox = jnp.repeat(d, 2 * r + 1)  # a-major
    oy = jnp.tile(d, 2 * r + 1)
    return ox, oy


def sample_corr_window(corr_l: jax.Array, cx: jax.Array, cy: jax.Array, radius: int) -> jax.Array:
    """Bilinear-sample a (2r+1)^2 window of corr_l around (cx, cy) per query pixel.

    corr_l: [B, Q, Hl, Wl] correlation at one pyramid level (fp32).
    cx, cy: [B, Q] center coordinates in level-l pixel units.
    Returns [B, Q, (2r+1)^2] in the reference channel order; out-of-bounds taps are 0.
    """
    B, Q, Hl, Wl = corr_l.shape
    ox, oy = _window_offsets(radius)
    K = ox.shape[0]

    px = cx[..., None] + ox  # [B, Q, K]
    py = cy[..., None] + oy

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = corr_l.reshape(B, Q, Hl * Wl)

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= Wl - 1) & (yi >= 0) & (yi <= Hl - 1)
        idx = jnp.clip(yi, 0, Hl - 1) * Wl + jnp.clip(xi, 0, Wl - 1)
        v = jnp.take_along_axis(flat, idx, axis=2)
        return jnp.where(inb, v, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)

    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def corr_pyramid_lookup(
    pyramid: Sequence[jax.Array], coords: jax.Array, radius: int
) -> jax.Array:
    """Multi-level windowed correlation lookup.

    pyramid: tuple of [B, Q, H_l, W_l] (Q = h*w of frame-1 grid, row-major).
    coords: [B, h, w, 2] query coordinates (x, y) in level-0 pixel units.
    Returns [B, h, w, L*(2r+1)^2] features, levels concatenated coarse-last,
    matching `core/corr.py:73-94`.
    """
    B, h, w, _ = coords.shape
    cx = coords[..., 0].reshape(B, h * w)
    cy = coords[..., 1].reshape(B, h * w)

    out = []
    for lvl, corr_l in enumerate(pyramid):
        scale = 1.0 / (2.0**lvl)
        o = sample_corr_window(corr_l, cx * scale, cy * scale, radius)
        out.append(o)
    out = jnp.concatenate(out, axis=-1)
    return out.reshape(B, h, w, -1)
