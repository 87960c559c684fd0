"""Shift-window spatial correlation (the `spatial-correlation-sampler` op).

Parity targets:
  - `liteflownet3_correlation.py:35-131` (`iter_spatial_correlation_sample`,
    kernel_size=1, stride=1): zero-pad input2 by dilation_patch * (patch//2), then
    corr[b, pi, pj, y, x] = sum_c in1[b, c, y, x] * in2_pad[b, c, y + pi*d, x + pj*d],
    output viewed as [B, patch^2, H, W] with channel k = pi*patch + pj (pi = y
    offset index — y-major, unlike RAFT's CorrBlock which is x-major).
  - `liteflownet3_correlation.py:222-349` (`iter_translated_spatial_correlation_sample`):
    the same windowed correlation but sampled around coords = grid + flow with
    bilinear interpolation — correlation *without warping input2 first*.

TPU notes: the integer-offset variant is a static shift-and-multiply — XLA fuses the
pad/slice/mul/reduce chain with no gathers and keeps the MXU free for the convs
around it. The translated variant reuses the separable on-demand machinery from
kernels/corr_ondemand.py (y-major channel order adapter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spatial_correlation_sample(
    in1: jax.Array,
    in2: jax.Array,
    patch_size: int,
    dilation_patch: int = 1,
) -> jax.Array:
    """Local correlation of NHWC feature maps over a (patch x patch) offset window.

    in1, in2: [B, H, W, C]. Returns [B, H, W, patch^2], channel k = pi*patch + pj
    for offset (dy, dx) = ((pi - patch//2)*dilation, (pj - patch//2)*dilation).
    Out-of-bounds offsets contribute zero. NOT normalized (callers divide by C as the
    reference does, `liteflownet3_simple.py:199,296`).
    """
    B, H, W, C = in1.shape
    p = patch_size
    d = dilation_patch
    half_lo = d * ((p - 1) // 2)
    half_hi = d * (p // 2)
    in2p = jnp.pad(in2, ((0, 0), (half_lo, half_hi), (half_lo, half_hi), (0, 0)))

    outs = []
    for pi in range(p):
        for pj in range(p):
            shifted = jax.lax.dynamic_slice(
                in2p, (0, pi * d, pj * d, 0), (B, H, W, C)
            )
            # fp32 accumulation over C even for bf16 features (the upcasts fuse
            # into the multiply-reduce — register work, not extra HBM); one
            # rounding back to the feature dtype below
            outs.append(
                jnp.sum(
                    in1.astype(jnp.float32) * shifted.astype(jnp.float32), axis=-1
                )
            )
    # Getting the p^2 window maps onto the lane (last) dim is a layout trap:
    # stack(axis=-1) — and even stack(axis=1) + transpose — lets XLA propagate
    # the lane-minor output layout back into the concat operands, materializing
    # p^2 temps with a singleton lane dim padded 128x (224 MB each at LFN3
    # batch-16 serving scale -> RESOURCE_EXHAUSTED at compile). Break the
    # propagation with a placement matmul: stack on the LEADING dim (temps
    # [1, B, HW] tile cleanly on (B, HW)) and move the window dim to lanes via
    # an identity contraction — dot operands get standard matmul layouts, so
    # nothing upstream inherits the padded layout. HIGHEST precision when the
    # values are fp32 (default MXU precision truncates operands to bf16).
    stacked = jnp.stack([o.reshape(B, H * W) for o in outs], axis=0)  # [p^2,B,HW]
    # one rounding to the feature dtype (bf16 under the mixed policy) — also
    # keeps the placement matmul off HIGHEST's 6-pass cost for bf16
    stacked = stacked.astype(in1.dtype)
    eye = jnp.eye(p * p, dtype=stacked.dtype)
    prec = jax.lax.Precision.HIGHEST if stacked.dtype == jnp.float32 else None
    out = jax.lax.dot_general(  # [B, HW, p^2]
        stacked, eye, (((0,), (0,)), ((), ())), precision=prec
    )
    return out.reshape(B, H, W, p * p)


def translated_spatial_correlation_sample(
    in1: jax.Array,
    in2: jax.Array,
    flow: jax.Array,
    patch_size: int,
    dilation_patch: int = 1,
) -> jax.Array:
    """Windowed correlation sampled at (grid + flow) with bilinear interpolation.

    in1, in2: [B, H, W, C]; flow: [B, H, W, 2] pixel units (x, y).
    Returns [B, H, W, patch^2] in y-major channel order (pi*patch + pj), matching
    `liteflownet3_correlation.py:222-349`.
    """
    from raft_optical_flow_tpu.ops.grid import bilinear_sampler, coords_grid

    B, H, W, C = in1.shape
    p = patch_size
    half = (p - 1) // 2
    offs = dilation_patch * (jnp.arange(p, dtype=jnp.float32) - half)
    oy = jnp.repeat(offs, p)  # y-major
    ox = jnp.tile(offs, p)

    coords = coords_grid(B, H, W) + flow
    pts = jnp.stack([coords[..., 0:1] + ox, coords[..., 1:2] + oy], axis=-1)
    sampled = bilinear_sampler(in2, pts, padding="zeros")  # [B, H, W, p^2, C]
    # fp32 accumulation over C; single rounding back to the feature dtype
    out = jnp.einsum(
        "bhwc,bhwkc->bhwk", in1, sampled, preferred_element_type=jnp.float32
    )
    return out.astype(in1.dtype)
