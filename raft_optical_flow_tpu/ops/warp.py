"""Backward warping and forward splatting.

Parity targets:
  - backward warp by flow = `uflow_loss_pytorch.py:110-190` (`flow_to_warp` + `resample`)
    and `liteflownet3_warp.py:66-111` / `IFNET_m.py:7-21` (grid_sample variants with
    zeros / border padding).
  - forward splat occupancy (range map) = `uflow_loss_pytorch.py:192-292`
    (`compute_range_map`): scatter-add of the 4 bilinear weights at each warped point.

TPU notes: backward warp = 4 gathers (see ops/grid.py); forward splat = one scatter-add
expressed through `Array.at[].add`, which XLA lowers to a deterministic sorted scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.ops.grid import bilinear_sampler, coords_grid


def flow_to_warp(flow: jax.Array) -> jax.Array:
    """Pixel-coordinate warp grid: coords[n,y,x] = (x, y) + flow. flow: [N,H,W,2].

    Coordinates are always fp32: under the bf16 compute policy a flow tensor can
    arrive bf16, and a bf16 *grid* quantizes absolute pixel positions (bf16
    spacing at x ~ 1024 is 4 px) — the flow values round once, the positions
    must not.
    """
    N, H, W, _ = flow.shape
    return coords_grid(N, H, W) + flow.astype(jnp.float32)


def backward_warp(
    img: jax.Array,
    flow: jax.Array,
    padding: str = "zeros",
    return_mask: bool = False,
):
    """Sample img at (grid + flow). img: [N,H,W,C], flow: [N,H,W,2] (x, y)."""
    coords = flow_to_warp(flow)
    return bilinear_sampler(img, coords, padding=padding, return_mask=return_mask)


def warp_lfn3(x: jax.Array, flow: jax.Array, div_flow: float = 1.0) -> jax.Array:
    """IRR-style backward warp with hard validity mask (`liteflownet3_warp.py:66-111`).

    x: [N, H, W, C]; flow: [N, H, W, 2] (x, y), divided by div_flow before use.
    grid_sample(align_corners=True, zeros padding), then multiplied by a binary
    mask that is 1 where the sampled all-ones image stays >= 1 — i.e. every
    bilinear tap in bounds. We use the exact analytic form of that condition (the
    closed box [0, W-1] x [0, H-1]): the reference computes it by thresholding a
    float weight sum, which drops an occasional interior pixel to 1-ulp rounding;
    that noise is implementation-specific and not reproducible bit-for-bit, so the
    deterministic box is the better-defined equivalent.
    """
    N, H, W, _ = x.shape
    # fp32 coords regardless of the flow dtype — see flow_to_warp
    coords = coords_grid(N, H, W) + flow.astype(jnp.float32) / div_flow
    warped = bilinear_sampler(x, coords, padding="zeros")
    px, py = coords[..., 0], coords[..., 1]
    mask = (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1)
    return warped * mask[..., None].astype(warped.dtype)


def forward_splat_range_map(flow: jax.Array) -> jax.Array:
    """Forward-warp occupancy map: how often each target pixel is hit by (grid + flow).

    flow: [N, H, W, 2]. Returns [N, H, W, 1] with the scatter-added bilinear weights —
    the UFlow `compute_range_map` with downsampling_factor=1
    (`uflow_loss_pytorch.py:192-292`).
    """
    N, H, W, _ = flow.shape
    coords = flow_to_warp(flow)
    x = coords[..., 0].reshape(N, -1)
    y = coords[..., 1].reshape(N, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = jnp.zeros((N, H * W), dtype=flow.dtype)

    def splat(out, xi, yi, wgt):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        wgt = jnp.where(inb, wgt, 0.0)
        return out.at[jnp.arange(N)[:, None], idx].add(wgt)

    out = splat(out, x0i, y0i, (1 - wx) * (1 - wy))
    out = splat(out, x0i + 1, y0i, wx * (1 - wy))
    out = splat(out, x0i, y0i + 1, (1 - wx) * wy)
    out = splat(out, x0i + 1, y0i + 1, wx * wy)
    return out.reshape(N, H, W, 1)


def forward_splat(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Forward-warp img by flow with bilinear splatting (unnormalized).

    img: [N,H,W,C], flow: [N,H,W,2] -> [N,H,W,C] accumulated splat. Matches the scatter
    in `unflow_ops_pytorch.py:6-86` (density when img=ones).
    """
    N, H, W, C = img.shape
    coords = flow_to_warp(flow)
    x = coords[..., 0].reshape(N, -1)
    y = coords[..., 1].reshape(N, -1)
    vals = img.reshape(N, -1, C)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = jnp.zeros((N, H * W, C), dtype=img.dtype)

    def splat(out, xi, yi, wgt):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        wgt = jnp.where(inb, wgt, 0.0)
        return out.at[jnp.arange(N)[:, None], idx].add(wgt[..., None] * vals)

    out = splat(out, x0i, y0i, (1 - wx) * (1 - wy))
    out = splat(out, x0i + 1, y0i, wx * (1 - wy))
    out = splat(out, x0i, y0i + 1, (1 - wx) * wy)
    out = splat(out, x0i + 1, y0i + 1, wx * wy)
    return out.reshape(N, H, W, C)
