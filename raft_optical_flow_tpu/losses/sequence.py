"""Supervised sequence / multi-scale flow losses.

Parity targets:
  - `train.py:47-106` — RAFT sequence_loss: gamma-weighted L1 over GRU iterations,
    validity = (valid >= 0.5) & (|gt| < 400); the mean is over *all* pixels with
    invalids zeroed (NOT valid-count normalized — a documented reference quirk,
    SURVEY.md §7.4); metrics (epe/1px/3px/5px) over valid pixels of the last pred.
  - `train_liteflownet3.py:105-163` — multi-scale SequenceLoss: per-level weights,
    gt downscaled and value-scaled per level; this one IS valid-normalized.

jit-friendly: boolean indexing is replaced by mask-weighted reductions.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

MAX_FLOW = 400.0


def sequence_loss(
    flow_preds: jax.Array,
    flow_gt: jax.Array,
    valid: jax.Array,
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """RAFT gamma-weighted sequence loss.

    Args:
      flow_preds: [T, N, H, W, 2] stacked per-iteration predictions (lax.scan output).
      flow_gt: [N, H, W, 2]; valid: [N, H, W] (0/1).
      gamma: exponential decay; iteration i gets weight gamma^(T-i-1).

    Returns (scalar loss, metrics dict of scalars).
    """
    T = flow_preds.shape[0]
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)
    vmask = valid[..., None].astype(flow_preds.dtype)  # [N, H, W, 1]

    weights = gamma ** jnp.arange(T - 1, -1, -1, dtype=flow_preds.dtype)  # [T]
    i_loss = jnp.abs(flow_preds - flow_gt[None])  # [T, N, H, W, 2]
    # reference semantics: (valid * |err|).mean() over ALL elements
    per_iter = jnp.mean(vmask[None] * i_loss, axis=(1, 2, 3, 4))  # [T]
    flow_loss = jnp.sum(weights * per_iter)

    epe = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))  # [N, H, W]
    vf = valid.astype(epe.dtype)
    denom = jnp.maximum(vf.sum(), 1.0)

    def vmean(x):
        return jnp.sum(x * vf) / denom

    metrics = {
        "epe": vmean(epe),
        "1px": vmean((epe < 1).astype(epe.dtype)),
        "3px": vmean((epe < 3).astype(epe.dtype)),
        "5px": vmean((epe < 5).astype(epe.dtype)),
    }
    return flow_loss, metrics


def multiscale_sequence_loss(
    flow_preds: Sequence[jax.Array],
    flow_gt: jax.Array,
    valid: jax.Array,
    weights: Sequence[float] = (0.32, 0.08, 0.02, 0.01, 0.005),
    max_flow: float = MAX_FLOW,
) -> jax.Array:
    """Multi-scale L1 loss for coarse-to-fine models (LiteFlowNet3 family).

    Parity: `train_liteflownet3.py:105-163` with the driver's call convention
    (`:206-252`): flow_preds is FINEST-FIRST — [full-res final, 1/4, 1/8, 1/16, 1/32]
    where the pyramid levels have been multiplied by div_flow by the caller. Per
    level: GT bilinearly resized (half-pixel) and value-scaled by the single factor
    w_i/W (the reference scales both components by the width ratio), valid mask
    nearest-resized, elementwise L1 summed and divided by (valid pixel count + 1e-8).
    """
    from raft_optical_flow_tpu.ops.grid import resize_bilinear

    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid_f = ((valid >= 0.5) & (mag < max_flow)).astype(flow_gt.dtype)
    N, H, W, _ = flow_gt.shape

    total = 0.0
    for i, pred in enumerate(flow_preds):
        w_i = weights[i] if i < len(weights) else weights[-1]
        h, wd = pred.shape[1:3]
        if (h, wd) != (H, W):
            scale_factor = wd / W
            gt_i = resize_bilinear(flow_gt, (h, wd)) * jnp.asarray(
                scale_factor, flow_gt.dtype
            )
            v_i = jax.image.resize(valid_f[..., None], (N, h, wd, 1), method="nearest")
            v_i = (v_i > 0.5).astype(flow_gt.dtype)
        else:
            gt_i = flow_gt
            v_i = valid_f[..., None]
        l1 = jnp.abs(pred - gt_i)
        total = total + w_i * jnp.sum(v_i * l1) / (jnp.sum(v_i) + 1e-8)
    return total
