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

import contextlib
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# Mixed-precision policy: a scope (set by the top-level model from its config) that
# all conv/norm constructors read as their computation dtype. Params stay fp32
# (param_dtype default); activations/matmuls run in the scoped dtype — the TPU
# equivalent of the reference's autocast regions (`core/raft.py:12-22`).
_COMPUTE_DTYPE: Optional[Any] = None


@contextlib.contextmanager
def compute_dtype_scope(dtype: Optional[Any]):
    """Set the computation dtype for conv/norm layers constructed in this scope.

    Pass None (or float32) for full-precision; jnp.bfloat16 for mixed precision.
    """
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = None if dtype in (None, jnp.float32) else dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev


def scoped_dtype(dtype: Optional[Any] = None) -> Optional[Any]:
    return dtype if dtype is not None else _COMPUTE_DTYPE


def torch_pad(k: Union[int, Sequence[int]]):
    """Symmetric explicit padding; int or per-dim (ph, pw)."""
    if isinstance(k, int):
        return ((k, k), (k, k))
    return tuple((p, p) for p in k)


def _as_pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


# torch Conv2d's default kernel init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
# variance_scaling uniform draws U(+-sqrt(3*scale/fan)), so scale=1/3 reproduces it.
TORCH_DEFAULT_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# the reference RAFT encoders' explicit init (core/extractor.py:149-156)
KAIMING_OUT_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


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
    kernel_init=TORCH_DEFAULT_INIT,
) -> nn.Conv:
    """torch-geometry nn.Conv. Default *kernel* init matches torch Conv2d's
    default — every reference model family relies on it outside the RAFT
    encoders (which pass KAIMING_OUT_INIT, `core/extractor.py:149-156`). The
    ~10x-larger kaiming(fan_out) gain previously used everywhere gave
    random-init RAFT ~300 px initial flows, which stalls unsupervised (census)
    bootstrapping. Biases keep flax's zeros (torch draws U(+-1/sqrt(fan_in)));
    zero bias has the same O(1/sqrt(fan_in)) scale bound and the matched kernel
    magnitude is what fixes the bootstrapping — checkpoint loading overwrites
    both either way."""
    return nn.Conv(
        features=features,
        kernel_size=_as_pair(kernel_size),
        strides=_as_pair(stride),
        padding=torch_pad(padding),
        use_bias=use_bias,
        feature_group_count=groups,
        kernel_dilation=_as_pair(dilation),
        kernel_init=kernel_init,
        dtype=scoped_dtype(dtype),
        name=name,
    )


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with exact torch semantics, including `groups`.

    Implemented as input-dilated conv: out = conv(dilate_s(x), flip(W), pad=k-1-p),
    which is the definition of the transposed convolution. Output size
    (H-1)*s - 2p + k matches torch.

    `kernel` layout is (kh, kw, out_per_group, in) — i.e. the torch layout
    (in, out/g, kh, kw) with spatial dims moved in front (what
    utils/torch_convert.py produces) — so converted reference weights load as-is.
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 4
    stride: Union[int, Sequence[int]] = 2
    padding: int = 1
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = _as_pair(self.kernel_size)
        sh, sw = _as_pair(self.stride)
        p = self.padding
        g = self.groups
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (kh, kw, self.features // g, in_ch),
        )
        # (kh, kw, out/g, in) -> HWIO (kh, kw, in/g, out), spatially flipped
        w = kernel.reshape(kh, kw, self.features // g, g, in_ch // g)
        w = w.transpose(0, 1, 4, 3, 2).reshape(kh, kw, in_ch // g, self.features)
        w = w[::-1, ::-1]
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - p, kh - 1 - p), (kw - 1 - p, kw - 1 - p)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


def deconv(
    features: int,
    kernel_size: Union[int, Sequence[int]] = 4,
    stride: Union[int, Sequence[int]] = 2,
    padding: int = 1,
    *,
    name: str,
    use_bias: bool = True,
    groups: int = 1,
) -> TorchConvTranspose:
    """torch-geometry ConvTranspose2d: out = (H-1)*s - 2p + k."""
    return TorchConvTranspose(
        features=features,
        kernel_size=kernel_size,
        stride=stride,
        padding=padding,
        use_bias=use_bias,
        groups=groups,
        name=name,
    )


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel spatial normalization; no affine (torch default).

    Stats via E[x^2] - E[x]^2 in fp32 so both reductions fuse into ONE pass over
    the activation (the encoders run 16 of these on large tensors; the two-pass
    (x - mean)^2 formulation measurably dominated fnet time). The normalize pass
    runs in the input dtype — the stats are per-channel scalars, and keeping the
    full-tensor elementwise work in bf16 under the mixed policy measured ~10%
    faster on a conv+IN+relu chain than normalizing in fp32.
    """
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    mean_sq = (x32 * x32).mean(axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


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
        return nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=scoped_dtype(), name=name)(x)
    if norm_fn == "batch":
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=scoped_dtype(), name=name,
        )(x)
    if norm_fn == "instance":
        return instance_norm(x)
    if norm_fn == "none":
        return x
    raise ValueError(f"unknown norm_fn {norm_fn!r}")


def leaky_relu(x, negative_slope: float = 0.1):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)
