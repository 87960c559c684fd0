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

    The 9-neighbor combine is a broadcast-multiply-SUM on a FLAT f*f subpixel
    axis — both halves measured (tools/bench_train_ab.py, bs4 368x496 train
    step): the flat lane-sized axis avoids the 14x-padded [.., 9, 8, 8]
    relayout copies of the naive 6-D form, and the VPU broadcast-sum beats an
    einsum formulation by ~6 ms/step (a dot_general here either truncates the
    fp32 softmax weights to bf16 at DEFAULT MXU precision — a real hardware
    fidelity loss on the final output flow — or pays 6-pass HIGHEST, ~8
    ms/step; the broadcast form is exact AND fastest).
    """
    N, h, w, _ = flow.shape
    f = factor
    m = mask.reshape(N, h, w, 9, f * f)
    m = jax.nn.softmax(m, axis=3)

    nbrs = _shifted_neighbors_3x3(float(f) * flow)  # [N, h, w, 9, 2]
    up = jnp.sum(
        m[..., None].astype(jnp.float32)
        * nbrs[:, :, :, :, None, :].astype(jnp.float32),
        axis=3,
    )  # [N, h, w, f*f, 2]
    # interleave subpixels: [N, h, sy, w, sx, 2] -> [N, f*h, f*w, 2]
    up = up.reshape(N, h, w, f, f, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(N, f * h, f * w, 2)
