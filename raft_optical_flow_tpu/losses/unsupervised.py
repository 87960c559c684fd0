"""Multi-scale unsupervised loss for the SimpleFlowNet / LiteFlowNet3 trainers.

Parity targets:
  - `train_simple_flow_unsupervised.py:51-302` — warp_image (grid_sample,
    align_corners=True, zeros), compute_photometric_loss (L1 of warped diff),
    compute_edge_aware_loss (e^-|grad I| * |grad F|), compute_occlusion_mask
    (fb-consistency, |diff| > 0.01*|fw| + 0.5), UnsupervisedLoss with scale
    weights [0.32, 0.08, 0.02] and term weights photo 1.0 / smooth 0.1 /
    consist 0.1; bidirectional when backward flows are given.
  - `train_liteflownet3_unsupervised.py:105-258` — the same construction (that
    script is unrunnable as-is, SURVEY §7.4; this is the intended behavior).

All NHWC; flow channels (x, y), pixel units at each prediction's own resolution.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.losses.simple_flow_loss import edge_aware_smoothness
from raft_optical_flow_tpu.ops.grid import resize_bilinear
from raft_optical_flow_tpu.ops.warp import backward_warp


def warp_image(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp img by flow; img resized to flow's resolution first."""
    if img.shape[1:3] != flow.shape[1:3]:
        img = resize_bilinear(img, flow.shape[1:3])
    return backward_warp(img, flow, padding="zeros")


def photometric_loss(img1: jax.Array, img2: jax.Array, flow: jax.Array) -> jax.Array:
    """Mean L1 between img1 and img2 warped by flow."""
    return jnp.mean(jnp.abs(img1 - warp_image(img2, flow)))


def occlusion_mask(flow_fw: jax.Array, flow_bw: jax.Array) -> jax.Array:
    """1 = visible, 0 = occluded, from forward-backward consistency."""
    warped_bw = warp_image(flow_bw, flow_fw)
    flow_diff = flow_fw + warped_bw
    flow_mag = jnp.sqrt(jnp.sum(flow_fw**2, axis=-1, keepdims=True) + 1e-8)
    occ = jnp.sqrt(jnp.sum(flow_diff**2, axis=-1, keepdims=True)) > 0.01 * flow_mag + 0.5
    return (~occ).astype(flow_fw.dtype)


def unsupervised_loss(
    img1: jax.Array,
    img2: jax.Array,
    flow_preds_fw: Sequence[jax.Array],
    flow_preds_bw: Optional[Sequence[jax.Array]] = None,
    alpha_photo: float = 1.0,
    alpha_smooth: float = 0.1,
    alpha_consist: float = 0.1,
    scale_weights: Sequence[float] = (0.32, 0.08, 0.02),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Multi-scale photometric + edge-smooth + fb-consistency loss.

    img1/img2: [B, H, W, 3]; flow_preds_*: per-scale [B, h_i, w_i, 2] pixel-unit
    flows (any order; weights align by position like the reference).
    """
    num_scales = len(flow_preds_fw)
    if len(scale_weights) != num_scales:
        weights = [1.0 / num_scales] * num_scales
    else:
        weights = list(scale_weights)

    total_photo = 0.0
    total_smooth = 0.0
    total_consist = 0.0
    for i, (flow_fw, w) in enumerate(zip(flow_preds_fw, weights)):
        flow_bw = None
        if flow_preds_bw is not None and i < len(flow_preds_bw):
            flow_bw = flow_preds_bw[i]

        if flow_fw.shape[1:3] != img1.shape[1:3]:
            img1_s = resize_bilinear(img1, flow_fw.shape[1:3])
            img2_s = resize_bilinear(img2, flow_fw.shape[1:3])
        else:
            img1_s, img2_s = img1, img2

        photo = photometric_loss(img1_s, img2_s, flow_fw)
        if flow_bw is not None:
            photo = photo + photometric_loss(img2_s, img1_s, flow_bw)
        total_photo = total_photo + w * photo

        smooth = edge_aware_smoothness(flow_fw, img1_s)
        if flow_bw is not None:
            smooth = smooth + edge_aware_smoothness(flow_bw, img2_s)
        total_smooth = total_smooth + w * smooth

        if flow_bw is not None:
            occ = occlusion_mask(flow_fw, flow_bw)
            warped_bw = warp_image(flow_bw, flow_fw)
            consist = jnp.mean(occ * jnp.abs(flow_fw + warped_bw))
            total_consist = total_consist + w * consist

    total = (
        alpha_photo * total_photo
        + alpha_smooth * total_smooth
        + alpha_consist * total_consist
    )
    return total, {
        "total": total,
        "photometric": total_photo,
        "smoothness": total_smooth,
        "consistency": total_consist,
    }
