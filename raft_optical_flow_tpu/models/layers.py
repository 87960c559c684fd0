"""Shared Flax building blocks with PyTorch-parity semantics.

Conventions used across the model zoo:
  - NHWC activations, HWIO conv kernels, explicit (lo, hi) paddings (torch-style
    symmetric padding — never 'SAME', whose asymmetric pads differ for even sizes).
  - Norms match torch defaults: eps=1e-5; InstanceNorm has no affine params and uses
    per-sample batch statistics (torch InstanceNorm2d(affine=False,
    track_running_stats=False)); BatchNorm carries running stats in `batch_stats`.
  - Helpers return plain flax modules so parameter paths stay flat and map 1:1 onto
    the torch state_dict names (e.g. fnet/conv1/kernel <- fnet.conv1.weight).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_pad(k: Union[int, Sequence[int]]):
    """Symmetric explicit padding; int or per-dim (ph, pw)."""
    if isinstance(k, int):
        return ((k, k), (k, k))
    return tuple((p, p) for p in k)


def _as_pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def conv(
    features: int,
    kernel_size: Union[int, Sequence[int]] = 3,
    stride: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 1,
    *,
    name: str,
    use_bias: bool = True,
    groups: int = 1,
    dilation: Union[int, Sequence[int]] = 1,
    dtype=None,
) -> nn.Conv:
    """torch-geometry nn.Conv with kaiming(fan_out) init (core/extractor.py:150-157)."""
    return nn.Conv(
        features=features,
        kernel_size=_as_pair(kernel_size),
        strides=_as_pair(stride),
        padding=torch_pad(padding),
        use_bias=use_bias,
        feature_group_count=groups,
        kernel_dilation=_as_pair(dilation),
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        dtype=dtype,
        name=name,
    )


def deconv(
    features: int,
    kernel_size: Union[int, Sequence[int]] = 4,
    stride: Union[int, Sequence[int]] = 2,
    padding: int = 1,
    *,
    name: str,
    use_bias: bool = True,
) -> nn.ConvTranspose:
    """torch-geometry ConvTranspose2d: out = (H-1)*s - 2p + k.

    `transpose_kernel=True` gives the gradient-of-conv formulation torch uses, so
    converted weights ((in, out, kh, kw) -> (kh, kw, out, in)) apply unchanged.
    """
    p = padding
    return nn.ConvTranspose(
        features=features,
        kernel_size=_as_pair(kernel_size),
        strides=_as_pair(stride),
        padding=((p, p), (p, p)),
        use_bias=use_bias,
        transpose_kernel=True,
        name=name,
    )


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel spatial normalization; no affine (torch default)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def apply_norm(
    x: jax.Array,
    norm_fn: str,
    features: int,
    *,
    name: str,
    train: bool = False,
    num_groups: Optional[int] = None,
) -> jax.Array:
    """Dispatch over the reference's norm_fn in {'group','batch','instance','none'}.

    Must be called inside an @nn.compact __call__ (constructs named submodules).
    """
    if norm_fn == "group":
        g = num_groups if num_groups is not None else features // 8
        return nn.GroupNorm(num_groups=g, epsilon=1e-5, name=name)(x)
    if norm_fn == "batch":
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )(x)
    if norm_fn == "instance":
        return instance_norm(x)
    if norm_fn == "none":
        return x
    raise ValueError(f"unknown norm_fn {norm_fn!r}")


def leaky_relu(x, negative_slope: float = 0.1):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)
