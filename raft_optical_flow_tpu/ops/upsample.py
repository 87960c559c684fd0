"""Learned convex 8x flow upsampling (RAFT's `upsample_flow`).

Parity target: `core/raft.py:112-142` — mask [N, 64*9, h, w] is reshaped
(N, 1, 9, 8, 8, h, w), softmaxed over the 9 neighbors, and applied to the
3x3 unfolded neighborhood of 8*flow; subpixel layout interleaves as
(h, sub_y, w, sub_x).

TPU-native formulation: instead of `F.unfold` (an implicit gather) we build the 9
shifted copies of the flow with static pads/slices, which XLA fuses into the weighted
sum — no materialized [N, 18, h*w] buffer, no gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shifted_neighbors_3x3(x: jax.Array) -> jax.Array:
    """All 3x3 neighborhoods of x ([N,h,w,C]) as [N,h,w,9,C], zero padded.

    Neighbor k = ky*3+kx corresponds to offset (dy, dx) = (ky-1, kx-1), matching the
    row-major kernel enumeration of torch `F.unfold(x, [3,3], padding=1)`.
    """
    N, h, w, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for ky in range(3):
        for kx in range(3):
            taps.append(xp[:, ky : ky + h, kx : kx + w, :])
    return jnp.stack(taps, axis=3)


def convex_upsample(flow: jax.Array, mask: jax.Array, factor: int = 8) -> jax.Array:
    """Convex-combination upsampling of flow by `factor` using predicted mask weights.

    Args:
      flow: [N, h, w, 2] flow at low resolution.
      mask: [N, h, w, 9*factor*factor] raw (pre-softmax) weights. Channel c decomposes
        as c = (k * factor + sy) * factor + sx with k the 3x3-neighbor index — the same
        layout as `mask.view(N, 1, 9, 8, 8, h, w)` on the torch [N, 576, h, w] tensor.

    Returns:
      [N, factor*h, factor*w, 2].
    """
    N, h, w, _ = flow.shape
    f = factor
    # Keep the f*f subpixel axis FLAT (lane-sized 64) instead of the naive
    # [..., 9, f, f] 6-D form: trailing (8, 8) dims give XLA small-lane
    # layouts whose relayout copies showed up at 0.5-1.1 ms each in the
    # round-4 train-step trace (f32[4,46,62,9,8,8] class).
    m = mask.reshape(N, h, w, 9, f * f)
    m = jax.nn.softmax(m, axis=3)

    nbrs = _shifted_neighbors_3x3(float(f) * flow)  # [N, h, w, 9, 2]
    # contract the 9 neighbors: [N,h,w,f*f,9] x [N,h,w,9,2] -> [N,h,w,f*f,2]
    # HIGHEST when the operands are fp32 (same rule as ops/spatial_corr.py):
    # if XLA lowers this to an MXU dot_general, DEFAULT precision would
    # truncate the softmax weights and flow values to bf16 — invisible on
    # CPU, a real fidelity loss on hardware (the 232bd12 failure class).
    # This produces the final output flow, so it must not round.
    prec = jax.lax.Precision.HIGHEST if m.dtype == jnp.float32 else None
    up = jnp.einsum("nhwks,nhwkc->nhwsc", m, nbrs, precision=prec)
    # interleave subpixels: [N, h, sy, w, sx, 2] -> [N, f*h, f*w, 2]
    up = up.reshape(N, h, w, f, f, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(N, f * h, f * w, 2)
