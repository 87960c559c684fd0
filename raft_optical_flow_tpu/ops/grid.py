"""Coordinate grids and bilinear sampling with PyTorch `grid_sample` parity.

Reference semantics being matched (cited for parity checking, not copied):
  - `core/utils/utils.py:57-71` — `bilinear_sampler`: pixel-coordinate wrapper around
    `F.grid_sample(..., align_corners=True)` with zero padding; optional in-bounds mask
    computed on the *open* interval (0, W-1) x (0, H-1).
  - `core/utils/utils.py:74-77` — `coords_grid`: (x, y) channel order.
  - `core/utils/utils.py:80-82` — `upflow8`: x8 bilinear (align_corners=True) and x8 values.

TPU notes: sampling is expressed as 4 clamped gathers + lerp (no dynamic shapes, no
scatter), which XLA lowers to vectorized dynamic-gathers. The correlation-lookup hot path
has a dedicated Pallas kernel in `kernels/`; this module is the semantic reference and
the general-purpose implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """Pixel-coordinate grid, shape [batch, ht, wd, 2], channels (x, y)."""
    y = jax.lax.broadcasted_iota(dtype, (ht, wd), 0)
    x = jax.lax.broadcasted_iota(dtype, (ht, wd), 1)
    grid = jnp.stack([x, y], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def _gather_2d(img: jax.Array, xi: jax.Array, yi: jax.Array) -> jax.Array:
    """Gather img[n, yi, xi, :] for integer index arrays xi/yi of shape [N, ...].

    img: [N, H, W, C]; xi/yi: [N, *S] int32 (already clamped in-bounds).
    Returns [N, *S, C].
    """
    N, H, W, C = img.shape
    flat_idx = (yi * W + xi).reshape(N, -1)
    flat_img = img.reshape(N, H * W, C)
    out = jnp.take_along_axis(flat_img, flat_idx[..., None], axis=1)
    return out.reshape(*xi.shape, C)


def bilinear_sampler(
    img: jax.Array,
    coords: jax.Array,
    padding: str = "zeros",
    return_mask: bool = False,
):
    """Bilinear sample `img` at pixel coordinates, matching torch grid_sample.

    Args:
      img: [N, H, W, C].
      coords: [N, *S, 2] pixel coordinates, channels (x, y). align_corners=True
        semantics: coordinate (0, 0) is the center of the top-left pixel and
        (W-1, H-1) the bottom-right pixel.
      padding: 'zeros' (out-of-bounds taps contribute 0) or 'border' (coords clamped).
      return_mask: if True also return the strict in-bounds mask (reference
        `core/utils/utils.py:67-69`: open interval).

    Returns:
      [N, *S, C] samples (and optionally [N, *S] float mask).

    Implementation (TPU): XLA's TPU gather cost is per-row and independent of
    row width (~7 ns/row measured on v5e regardless of 3- vs 128-wide rows), so
    the classic 4-tap formulation pays 4x the gather it needs. Instead the 2x2
    patch is pre-packed into channels with three shifted copies (full-bandwidth
    elementwise ops) and fetched with ONE gather at the patch root
    clip(floor(coord), 0, size-2); per-tap weights become hat functions
    relu(1 - |coord - tap_pos|), which reproduces both padding modes exactly
    (an out-of-bounds tap has hat weight 0 against every in-window position).
    3.8x faster than 4 taps at [4, 432, 1024, 3] (the IFNet warp-cascade shape)
    and the same trick accelerates the VJP (one scatter instead of four).
    """
    N, H, W, C = img.shape
    if padding not in ("zeros", "border"):
        raise ValueError(f"unknown padding mode {padding!r}")
    if H < 2 or W < 2:
        return _bilinear_sampler_taps(img, coords, padding, return_mask)
    x = coords[..., 0]
    y = coords[..., 1]

    if padding == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)

    S = x.shape[1:]
    xf = x.reshape(N, -1)
    yf = y.reshape(N, -1)
    x0 = jnp.clip(jnp.floor(xf), 0.0, W - 2.0)
    y0 = jnp.clip(jnp.floor(yf), 0.0, H - 2.0)

    # aug[n, y, x] = [img[y, x], img[y, x+1], img[y+1, x], img[y+1, x+1]]
    # (edge-replicated; replicated cells are never selected — indices stop at
    # size-2 — they only keep the shifted copies shape-aligned)
    e = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    s = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    se = jnp.concatenate([e[:, 1:], e[:, -1:]], axis=1)
    aug = jnp.concatenate([img, e, s, se], axis=-1).reshape(N, H * W, 4 * C)

    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
    taps = jnp.take_along_axis(aug, idx[..., None], axis=1)  # [N, Q, 4C]

    wy0 = jnp.maximum(1.0 - jnp.abs(yf - y0), 0.0).astype(img.dtype)[..., None]
    wy1 = jnp.maximum(1.0 - jnp.abs(yf - (y0 + 1.0)), 0.0).astype(img.dtype)[..., None]
    wx0 = jnp.maximum(1.0 - jnp.abs(xf - x0), 0.0).astype(img.dtype)[..., None]
    wx1 = jnp.maximum(1.0 - jnp.abs(xf - (x0 + 1.0)), 0.0).astype(img.dtype)[..., None]
    out = (
        taps[..., 0 * C:1 * C] * (wy0 * wx0)
        + taps[..., 1 * C:2 * C] * (wy0 * wx1)
        + taps[..., 2 * C:3 * C] * (wy1 * wx0)
        + taps[..., 3 * C:4 * C] * (wy1 * wx1)
    )
    out = out.reshape(N, *S, C)

    if return_mask:
        mask = (x > 0) & (x < W - 1) & (y > 0) & (y < H - 1)
        return out, mask.astype(img.dtype)
    return out


def _bilinear_sampler_taps(
    img: jax.Array,
    coords: jax.Array,
    padding: str = "zeros",
    return_mask: bool = False,
):
    """4-tap reference formulation (used when H or W < 2, where the packed
    patch root clip(floor, 0, size-2) is undefined)."""
    N, H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]

    if padding == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img.dtype)
    wy = (y - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        v = _gather_2d(img, jnp.clip(xi, 0, W - 1), jnp.clip(yi, 0, H - 1))
        if padding == "zeros":
            inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            v = jnp.where(inb[..., None], v, jnp.zeros((), img.dtype))
        return v

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )

    if return_mask:
        mask = (x > 0) & (x < W - 1) & (y > 0) & (y < H - 1)
        return out, mask.astype(img.dtype)
    return out


def grid_sample_nearest(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Nearest-neighbor sampling at pixel coords (x, y); border clamped."""
    N, H, W, C = img.shape
    xi = jnp.clip(jnp.round(coords[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(coords[..., 1]).astype(jnp.int32), 0, H - 1)
    return _gather_2d(img, xi, yi)


def _interp_axis_align_corners(x: jax.Array, out_size: int, axis: int) -> jax.Array:
    """1-D linear interpolation along `axis` with align_corners=True mapping."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    pos = jnp.linspace(0.0, in_size - 1.0, out_size, dtype=jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 2)
    w = (pos - i0.astype(jnp.float32)).astype(x.dtype)
    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i0 + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return lo * (1 - w) + hi * w


def resize_bilinear_align_corners(img: jax.Array, out_hw: tuple) -> jax.Array:
    """Bilinear resize with torch `align_corners=True` semantics. img: [..., H, W, C]."""
    out_h, out_w = out_hw
    img = _interp_axis_align_corners(img, out_h, axis=img.ndim - 3)
    img = _interp_axis_align_corners(img, out_w, axis=img.ndim - 2)
    return img


def resize_bilinear(img: jax.Array, out_hw: tuple) -> jax.Array:
    """Bilinear resize with half-pixel centers (torch align_corners=False).

    antialias=False: torch F.interpolate(mode='bilinear') never widens the filter
    on downsampling, and models in this repo match that (e.g. `IFNET_m.py:123-146`
    scale-pyramid downsamples).
    """
    out_h, out_w = out_hw
    *lead, H, W, C = img.shape
    return jax.image.resize(
        img, (*lead, out_h, out_w, C), method="bilinear", antialias=False
    )


def upflow8(flow: jax.Array) -> jax.Array:
    """8x bilinear upsample (align_corners=True) of flow, values scaled x8.

    flow: [N, h, w, 2] -> [N, 8h, 8w, 2]. Parity: `core/utils/utils.py:80-82`.
    """
    N, h, w, _ = flow.shape
    return 8.0 * resize_bilinear_align_corners(flow, (8 * h, 8 * w))


def upflow_n(flow: jax.Array, factor: int) -> jax.Array:
    """Generalized n-x bilinear upsample of flow with value scaling."""
    N, h, w, _ = flow.shape
    return float(factor) * resize_bilinear_align_corners(flow, (factor * h, factor * w))
