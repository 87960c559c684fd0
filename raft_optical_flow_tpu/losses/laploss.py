"""Laplacian-pyramid reconstruction loss (RIFE LapLoss).

Parity target: `IFNet_laploss.py:10-79` — 5x5 binomial kernel (sum 256), reflect-pad
depthwise blur, stride-2 decimation, zero-insert upsample re-blurred with 4x kernel,
per-level L1 mean; `laploss` sums over the warped-image list in both directions and
reports a photometric 'epe' proxy for the last stage.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_KERNEL_1D = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0])
_KERNEL = jnp.outer(_KERNEL_1D, _KERNEL_1D) / 256.0  # [5, 5]


def _conv_gauss(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 5x5 blur with reflect padding. img: [N, H, W, C]."""
    C = img.shape[-1]
    img = jnp.pad(img, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    k = jnp.broadcast_to(kernel[:, :, None, None], (5, 5, 1, C)).astype(img.dtype)
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _downsample(x: jax.Array) -> jax.Array:
    return x[:, ::2, ::2, :]


def _upsample(x: jax.Array) -> jax.Array:
    """Zero-insert 2x upsample followed by 4x gauss blur (`IFNet_laploss.py:25-34`)."""
    N, H, W, C = x.shape
    up = jnp.zeros((N, 2 * H, 2 * W, C), x.dtype)
    up = up.at[:, ::2, ::2, :].set(x)
    return _conv_gauss(up, 4.0 * _KERNEL)


def laplacian_pyramid(img: jax.Array, max_levels: int = 5):
    current = img
    pyr = []
    for _ in range(max_levels):
        filtered = _conv_gauss(current, _KERNEL)
        down = _downsample(filtered)
        up = _upsample(down)
        pyr.append(current - up)
        current = down
    return pyr


def lap_loss(input: jax.Array, target: jax.Array, max_levels: int = 5) -> jax.Array:
    """Sum of per-level L1 means between the two Laplacian pyramids."""
    pi = laplacian_pyramid(input, max_levels)
    pt = laplacian_pyramid(target, max_levels)
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(pi, pt))


def laploss(
    warped_list: Sequence[Tuple[jax.Array, jax.Array]],
    img0: jax.Array,
    img1: jax.Array,
    max_levels: int = 5,
):
    """Unsupervised IFNet loss over all cascade stages (`IFNet_laploss.py:70-79`).

    warped_list: [(warped_img0, warped_img1)] per stage; each warped_img1 is
    compared against img0 and warped_img0 against img1 (the reference's pairing).
    Returns (loss, {'epe': photometric L1 proxy of the final stage}).
    """
    loss = 0.0
    for warp0, warp1 in warped_list:
        loss = loss + lap_loss(warp1, img0, max_levels)
        loss = loss + lap_loss(warp0, img1, max_levels)
    epe = (
        jnp.mean(jnp.abs(warped_list[-1][1] - img0))
        + jnp.mean(jnp.abs(warped_list[-1][0] - img1))
    ) / 2.0
    return loss, {"epe": epe}
