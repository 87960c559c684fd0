"""SimpleFlowNet supervised loss: multi-scale EPE + edge-aware smoothness.

Parity target: `simple_flow_net.py:562-758` (SimpleFlowLoss) — per scale: GT
bilinearly resized (half-pixel) and value-scaled by the width ratio, validity =
(valid >= 0.5) & (|gt| < 400) nearest-resized, L2-norm EPE masked and averaged over
ALL pixels (not valid-normalized — reference quirk), weights coarse-first
[0.32, 0.08, 0.02]; plus edge-aware smoothness e^-|grad I| * |grad F| on the finest
prediction (`:708-758`).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.ops.grid import resize_bilinear


def edge_aware_smoothness(flow: jax.Array, image: jax.Array) -> jax.Array:
    """e^-|grad I| weighted L1 flow gradient (`simple_flow_net.py:708-758`)."""
    if image.shape[1:3] != flow.shape[1:3]:
        image = resize_bilinear(image, flow.shape[1:3])
    gray = jnp.mean(image, axis=-1, keepdims=True)
    img_dx = gray[:, :, 1:] - gray[:, :, :-1]
    img_dy = gray[:, 1:] - gray[:, :-1]
    flow_dx = flow[:, :, 1:] - flow[:, :, :-1]
    flow_dy = flow[:, 1:] - flow[:, :-1]
    wx = jnp.exp(-jnp.abs(img_dx))
    wy = jnp.exp(-jnp.abs(img_dy))
    return jnp.mean(wx * jnp.abs(flow_dx)) + jnp.mean(wy * jnp.abs(flow_dy))


def simple_flow_loss(
    flow_preds: Sequence[jax.Array],
    flow_gt: jax.Array,
    valid: Optional[jax.Array] = None,
    image: Optional[jax.Array] = None,
    weights: Sequence[float] = (0.32, 0.08, 0.02),
    edge_weight: float = 0.1,
    max_flow: float = 400.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """flow_preds: coarse-first [1/8, 1/4, 1/2] each [N, h, w, 2] in pixel units.

    Returns (total_loss, {'epe': finest-scale masked EPE mean, 'edge': ..., 'total'}).
    """
    N, H, W, _ = flow_gt.shape
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    base_valid = mag < max_flow
    if valid is not None:
        base_valid = (valid >= 0.5) & base_valid
    valid_f = base_valid.astype(flow_gt.dtype)[..., None]

    total = 0.0
    epe_loss = 0.0
    epe_last = None
    for i, pred in enumerate(flow_preds):
        w_i = weights[i] if i < len(weights) else weights[-1]
        h, w = pred.shape[1:3]
        scale_factor = w / W
        gt_i = resize_bilinear(flow_gt, (h, w)) * jnp.asarray(scale_factor, flow_gt.dtype)
        v_i = jax.image.resize(valid_f, (N, h, w, 1), method="nearest")[..., 0]
        epe = jnp.sqrt(jnp.sum((pred - gt_i) ** 2, axis=-1)) * v_i
        epe_last = jnp.mean(epe)
        epe_loss = epe_loss + w_i * jnp.mean(epe)  # mean over ALL pixels (quirk)
    total = total + epe_loss

    metrics = {"epe": epe_last}
    if edge_weight > 0 and image is not None:
        edge = edge_aware_smoothness(flow_preds[-1], image)
        metrics["edge"] = edge
        total = total + edge_weight * edge
    metrics["total"] = total
    return total, metrics
