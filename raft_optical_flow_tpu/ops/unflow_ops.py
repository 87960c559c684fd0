"""Standalone UnFlow warp ops: forward-splat density, backward warp, occlusion.

Parity target: `unflow_ops_pytorch.py:6-234` — `forward_warp_op` (bilinear scatter
density map), `backward_warp_op` (grid_sample backward warp), and
`occlusion_detection` combining splat density with forward-backward consistency
(1 = visible, 0 = occluded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.ops.grid import coords_grid
from raft_optical_flow_tpu.ops.warp import backward_warp


def forward_warp_op(flow: jax.Array) -> jax.Array:
    """Density of forward-splatted bilinear weights [B, H, W, 1].

    UnFlow semantics (`unflow_ops_pytorch.py:6-86` / `unflow_loss_pytorch.py:83-149`):
    points whose (unfloored) target is strictly inside the image are kept, and the
    +1 taps are CLAMPED into the image (border cells double-collect) rather than
    dropped — unlike ops/warp.forward_splat_range_map (UFlow semantics). The
    reference's `tensor[idx] += w` drops duplicate-index contributions (torch
    quirk); we implement the intended accumulation (SURVEY.md §7.4).
    """
    N, H, W, _ = flow.shape
    coords = coords_grid(N, H, W, dtype=flow.dtype) + flow
    x = coords[..., 0].reshape(N, -1)
    y = coords[..., 1].reshape(N, -1)
    valid = (x >= 0) & (x < W) & (y >= 0) & (y < H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    out = jnp.zeros((N, H * W), flow.dtype)
    bidx = jnp.arange(N)[:, None]
    vf = valid.astype(flow.dtype)
    out = out.at[bidx, y0i * W + x0i].add(vf * (1 - wx) * (1 - wy))
    out = out.at[bidx, y1i * W + x0i].add(vf * (1 - wx) * wy)
    out = out.at[bidx, y0i * W + x1i].add(vf * wx * (1 - wy))
    out = out.at[bidx, y1i * W + x1i].add(vf * wx * wy)
    return out.reshape(N, H, W, 1)


def backward_warp_op(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward warp sampling at grid MINUS flow (bilinear, zeros padding).

    Note the sign: this standalone op (`unflow_ops_pytorch.py:88-154`) samples at
    (x - flow_x, y - flow_y), unlike `image_warp` in the loss library which samples
    at grid + flow — a deliberate quirk of the reference, preserved here.
    """
    return backward_warp(image, -flow, padding="zeros")


def occlusion_detection(
    flow_fw: jax.Array,
    flow_bw: jax.Array,
    alpha1: float = 0.01,
    alpha2: float = 0.5,
) -> jax.Array:
    """Non-occlusion mask from splat density + fb-consistency (`:156-196`)."""
    density_fw = forward_warp_op(flow_fw)
    density_bw = forward_warp_op(flow_bw)
    density_mask_fw = (density_fw > alpha1).astype(flow_fw.dtype)
    density_mask_bw = (density_bw > alpha1).astype(flow_fw.dtype)

    flow_bw_warped = backward_warp_op(flow_bw, flow_fw)
    flow_diff = jnp.linalg.norm(flow_fw + flow_bw_warped, axis=3, keepdims=True)
    flow_magnitude = jnp.linalg.norm(flow_fw, axis=3, keepdims=True) + jnp.linalg.norm(
        flow_bw_warped, axis=3, keepdims=True
    )
    consistency_mask = (flow_diff < alpha2 * (flow_magnitude + 1e-6)).astype(
        flow_fw.dtype
    )
    return density_mask_fw * density_mask_bw * consistency_mask
