"""UnFlow unsupervised-loss library (JAX/NHWC port of the reference's TF-port).

Parity target: `unflow_loss_pytorch.py` —
  - image_warp (:27-80): backward warp, grid_sample(align_corners=True, zeros).
  - forward_warp (:83-149): bilinear scatter occupancy map (the reference loops per
    batch on host; here it is one vectorized scatter-add).
  - compute_losses (:152-244): photo / grad (Sobel) / smooth 1st / smooth 2nd
    (incl. diagonals) / fb-consistency / ternary (census) / occ / sym, all built on
    the generalized Charbonnier penalty (:612-638), with 'fb' or 'disocc' occlusion
    masking (DISOCC_THRESH=0.8).
  - ternary_loss (:247-294), occlusion (:297-315), divergence (:318-340),
    create_mask (:641-676), create_outgoing_mask (:694-719).

Flow channel order here is (x, y) — the repo convention (unlike losses/uflow.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.ops.grid import bilinear_sampler, coords_grid

DISOCC_THRESH = 0.8


def length_sq(x: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(x), axis=3, keepdims=True)


def image_warp(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward warp: sample image at grid + flow (zeros padding, align_corners)."""
    N, H, W, _ = image.shape
    coords = coords_grid(N, H, W, dtype=flow.dtype) + flow
    return bilinear_sampler(image, coords, padding="zeros")


def forward_warp(flow: jax.Array) -> jax.Array:
    """Forward-warp occupancy map [B, H, W, 1] (`unflow_loss_pytorch.py:83-149`).

    Delegates to ops/unflow_ops.forward_warp_op (clamped-border UnFlow splat with
    intended scatter-add accumulation; see that docstring for the quirk notes).
    """
    from raft_optical_flow_tpu.ops.unflow_ops import forward_warp_op

    return forward_warp_op(flow)


def create_mask(tensor: jax.Array, paddings) -> jax.Array:
    """Interior-ones border mask [B, H, W, 1] (`unflow_loss_pytorch.py:641-676`).

    paddings: [[top, bottom], [left, right]].
    """
    B, H, W, _ = tensor.shape
    (t, b), (l, r) = paddings
    inner = jnp.ones((H - t - b, W - l - r), tensor.dtype)
    mask2d = jnp.pad(inner, ((t, b), (l, r)))
    return jnp.broadcast_to(mask2d[None, :, :, None], (B, H, W, 1))


def create_outgoing_mask(flow: jax.Array) -> jax.Array:
    """1 where the flow endpoint stays inside the image (`:694-719`)."""
    N, H, W, _ = flow.shape
    coords = coords_grid(N, H, W, dtype=flow.dtype) + flow
    inside = (
        (coords[..., 0] >= 0.0)
        & (coords[..., 0] <= W - 1)
        & (coords[..., 1] >= 0.0)
        & (coords[..., 1] <= H - 1)
    )
    return inside.astype(flow.dtype)[..., None]


def charbonnier_loss(
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    truncate: Optional[float] = None,
    alpha: float = 0.45,
    beta: float = 1.0,
    epsilon: float = 0.001,
) -> jax.Array:
    """Generalized Charbonnier: mean of ((x*beta)^2 + eps^2)^alpha (`:612-638`)."""
    B, H, W, C = x.shape
    normalization = float(B * H * W * C)
    error = jnp.power(jnp.square(x * beta) + epsilon**2, alpha)
    if mask is not None:
        error = error * mask
    if truncate is not None:
        error = jnp.minimum(error, truncate)
    return jnp.sum(error) / normalization


def photometric_loss(im_diff: jax.Array, mask: jax.Array) -> jax.Array:
    return charbonnier_loss(im_diff, mask, beta=255.0)


def _conv2d_same(x: jax.Array, kernels: jax.Array) -> jax.Array:
    """x: [B, H, W, Cin]; kernels: [kh, kw, Cin, Cout]; 3x3 'same' conv."""
    return jax.lax.conv_general_dilated(
        x, kernels.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _gradient_delta(im1: jax.Array, im2_warped: jax.Array) -> jax.Array:
    """Sobel gradient differences, channels [R_x, R_y, G_x, G_y, B_x, B_y] (`:473-510`)."""
    sx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    sy = sx.T
    w = jnp.zeros((3, 3, 3, 6), jnp.float32)
    for c in range(3):
        w = w.at[:, :, c, 2 * c].set(sx)
        w = w.at[:, :, c, 2 * c + 1].set(sy)
    return _conv2d_same(im1, w) - _conv2d_same(im2_warped, w)


def gradient_loss(im1, im2_warped, mask):
    mask_x = create_mask(im1, [[0, 0], [1, 1]])
    mask_y = create_mask(im1, [[1, 1], [0, 0]])
    gradient_mask = jnp.tile(jnp.concatenate([mask_x, mask_y], axis=3), (1, 1, 1, 3))
    diff = _gradient_delta(im1, im2_warped)
    return charbonnier_loss(diff, mask * gradient_mask)


def _smoothness_deltas(flow):
    """First-order forward differences per component (`:429-456`)."""
    mask_x = create_mask(flow, [[0, 0], [0, 1]])
    mask_y = create_mask(flow, [[0, 1], [0, 0]])
    mask = jnp.concatenate([mask_x, mask_y], axis=3)
    fx = jnp.array([[0, 0, 0], [0, 1, -1], [0, 0, 0]], jnp.float32)
    fy = jnp.array([[0, 0, 0], [0, 1, 0], [0, -1, 0]], jnp.float32)
    w = jnp.stack([fx, fy], axis=-1)[:, :, None, :]  # [3,3,1,2]
    delta_u = _conv2d_same(flow[..., 0:1], w)
    delta_v = _conv2d_same(flow[..., 1:2], w)
    return delta_u, delta_v, mask


def smoothness_loss(flow):
    delta_u, delta_v, mask = _smoothness_deltas(flow)
    return charbonnier_loss(delta_u, mask) + charbonnier_loss(delta_v, mask)


def _second_order_deltas(flow):
    mask_x = create_mask(flow, [[0, 0], [1, 1]])
    mask_y = create_mask(flow, [[1, 1], [0, 0]])
    mask_diag = create_mask(flow, [[1, 1], [1, 1]])
    mask = jnp.concatenate([mask_x, mask_y, mask_diag, mask_diag], axis=3)
    filters = [
        [[0, 0, 0], [1, -2, 1], [0, 0, 0]],
        [[0, 1, 0], [0, -2, 0], [0, 1, 0]],
        [[1, 0, 0], [0, -2, 0], [0, 0, 1]],
        [[0, 0, 1], [0, -2, 0], [1, 0, 0]],
    ]
    w = jnp.stack([jnp.array(f, jnp.float32) for f in filters], axis=-1)[:, :, None, :]
    delta_u = _conv2d_same(flow[..., 0:1], w)
    delta_v = _conv2d_same(flow[..., 1:2], w)
    return delta_u, delta_v, mask


def second_order_loss(flow):
    delta_u, delta_v, mask = _second_order_deltas(flow)
    return charbonnier_loss(delta_u, mask) + charbonnier_loss(delta_v, mask)


def ternary_loss(im1, im2_warped, mask, max_distance: int = 1):
    """Census-transform consistency (`unflow_loss_pytorch.py:247-294`)."""
    patch_size = 2 * max_distance + 1

    def transform(image):
        intensities = jnp.mean(image, axis=3, keepdims=True) * 255.0
        B, H, W, _ = intensities.shape
        p = max_distance
        padded = jnp.pad(intensities[..., 0], ((0, 0), (p, p), (p, p)))
        taps = [
            padded[:, ky : ky + H, kx : kx + W]
            for ky in range(patch_size)
            for kx in range(patch_size)
        ]
        patches = jnp.stack(taps, axis=-1)
        t = patches - intensities
        return t / jnp.sqrt(0.81 + jnp.square(t))

    def hamming(t1, t2):
        d = jnp.square(t1 - t2)
        return jnp.sum(d / (0.1 + d), axis=3, keepdims=True)

    dist = hamming(transform(im1), transform(im2_warped))
    transform_mask = create_mask(
        mask, [[max_distance, max_distance], [max_distance, max_distance]]
    )
    return charbonnier_loss(dist, mask * transform_mask)


def occlusion(flow_fw, flow_bw) -> Tuple[jax.Array, jax.Array]:
    """fb-consistency occlusion masks (`:297-315`)."""
    mag_sq = length_sq(flow_fw) + length_sq(flow_bw)
    flow_bw_warped = image_warp(flow_bw, flow_fw)
    flow_fw_warped = image_warp(flow_fw, flow_bw)
    occ_thresh = 0.01 * mag_sq + 0.5
    occ_fw = (length_sq(flow_fw + flow_bw_warped) > occ_thresh).astype(flow_fw.dtype)
    occ_bw = (length_sq(flow_bw + flow_fw_warped) > occ_thresh).astype(flow_fw.dtype)
    return occ_fw, occ_bw


def divergence(flow):
    """Sobel-based flow divergence (`:318-340`)."""
    sx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    sy = sx.T
    gx = _conv2d_same(flow[..., 0:1], sx[:, :, None, None])
    gy = _conv2d_same(flow[..., 1:2], sy[:, :, None, None])
    return gx + gy


def compute_losses(
    im1: jax.Array,
    im2: jax.Array,
    flow_fw: jax.Array,
    flow_bw: jax.Array,
    border_mask: Optional[jax.Array] = None,
    mask_occlusion: str = "",
    data_max_distance: int = 1,
) -> Dict[str, jax.Array]:
    """Full UnFlow loss dictionary (`unflow_loss_pytorch.py:152-244`).

    All inputs NHWC; flows (x, y). Returns {photo, grad, smooth_1st, smooth_2nd,
    fb, ternary, occ, sym}.
    """
    losses = {}
    im2_warped = image_warp(im2, flow_fw)
    im1_warped = image_warp(im1, flow_bw)
    im_diff_fw = im1 - im2_warped
    im_diff_bw = im2 - im1_warped

    disocc_fw = (forward_warp(flow_fw) < DISOCC_THRESH).astype(im1.dtype)
    disocc_bw = (forward_warp(flow_bw) < DISOCC_THRESH).astype(im1.dtype)

    if border_mask is None:
        mask_fw = create_outgoing_mask(flow_fw)
        mask_bw = create_outgoing_mask(flow_bw)
    else:
        mask_fw = border_mask
        mask_bw = border_mask

    flow_bw_warped = image_warp(flow_bw, flow_fw)
    flow_fw_warped = image_warp(flow_fw, flow_bw)
    flow_diff_fw = flow_fw + flow_bw_warped
    flow_diff_bw = flow_bw + flow_fw_warped
    mag_sq_fw = length_sq(flow_fw) + length_sq(flow_bw_warped)
    mag_sq_bw = length_sq(flow_bw) + length_sq(flow_fw_warped)
    fb_occ_fw = (length_sq(flow_diff_fw) > 0.01 * mag_sq_fw + 0.5).astype(im1.dtype)
    fb_occ_bw = (length_sq(flow_diff_bw) > 0.01 * mag_sq_bw + 0.5).astype(im1.dtype)

    if mask_occlusion == "fb":
        mask_fw = mask_fw * (1 - fb_occ_fw)
        mask_bw = mask_bw * (1 - fb_occ_bw)
    elif mask_occlusion == "disocc":
        mask_fw = mask_fw * (1 - disocc_bw)
        mask_bw = mask_bw * (1 - disocc_fw)

    occ_fw = 1 - mask_fw
    occ_bw = 1 - mask_bw

    losses["sym"] = charbonnier_loss(occ_fw - disocc_bw) + charbonnier_loss(
        occ_bw - disocc_fw
    )
    losses["occ"] = charbonnier_loss(occ_fw) + charbonnier_loss(occ_bw)
    losses["photo"] = photometric_loss(im_diff_fw, mask_fw) + photometric_loss(
        im_diff_bw, mask_bw
    )
    losses["grad"] = gradient_loss(im1, im2_warped, mask_fw) + gradient_loss(
        im2, im1_warped, mask_bw
    )
    losses["smooth_1st"] = smoothness_loss(flow_fw) + smoothness_loss(flow_bw)
    losses["smooth_2nd"] = second_order_loss(flow_fw) + second_order_loss(flow_bw)
    losses["fb"] = charbonnier_loss(flow_diff_fw, mask_fw) + charbonnier_loss(
        flow_diff_bw, mask_bw
    )
    losses["ternary"] = ternary_loss(
        im1, im2_warped, mask_fw, max_distance=data_max_distance
    ) + ternary_loss(im2, im1_warped, mask_bw, max_distance=data_max_distance)
    return losses
