"""RAFT feature / context encoders (Flax, NHWC).

Parity targets: `core/extractor.py` —
  - ResidualBlock (:6-56): conv3x3(stride)+norm+relu, conv3x3+norm+relu, 1x1-downsample
    (+norm) skip when stride != 1, relu(x + y).
  - BottleneckBlock (:60-116): 1x1 -> 3x3(stride) -> 1x1 with norms, same skip.
  - BasicEncoder (:118-192): 7x7/s2 -> 3 stages x 2 ResidualBlocks (64/96/128,
    strides 1/2/2) -> 1x1 out conv; dropout2d in training.
  - SmallEncoder (:195-267): same topology with BottleneckBlocks (32/64/96).

Both encoders accept a pair of images stacked on the batch axis (the reference
batch-folds the two frames through fnet in one pass, `core/extractor.py:168-174`);
callers do the fold/unfold.

Submodule names mirror the torch attribute paths (layer1.0 -> layer1_0) so the
checkpoint converter is a mechanical rename.
"""

from __future__ import annotations

import functools

from flax import linen as nn

from raft_optical_flow_tpu.models.layers import KAIMING_OUT_INIT, apply_norm
from raft_optical_flow_tpu.models.layers import conv as _conv

# the reference re-initializes every encoder conv with kaiming(fan_out)
# (`core/extractor.py:149-156`); the rest of the model keeps torch defaults
conv = functools.partial(_conv, kernel_init=KAIMING_OUT_INIT)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: bool = None):
        bn_train = train if bn_train is None else bn_train
        y = conv(self.planes, 3, self.stride, 1, name="conv1")(x)
        y = apply_norm(y, self.norm_fn, self.planes, name="norm1", train=bn_train)
        y = nn.relu(y)
        y = conv(self.planes, 3, 1, 1, name="conv2")(y)
        y = apply_norm(y, self.norm_fn, self.planes, name="norm2", train=bn_train)
        y = nn.relu(y)

        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, 0, name="downsample_conv")(x)
            x = apply_norm(x, self.norm_fn, self.planes, name="downsample_norm", train=bn_train)

        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: bool = None):
        bn_train = train if bn_train is None else bn_train
        p4 = self.planes // 4
        # GroupNorm group count follows the reference: planes//8 groups even for the
        # planes//4-channel intermediates (core/extractor.py:69-74).
        g = self.planes // 8
        y = conv(p4, 1, 1, 0, name="conv1")(x)
        y = apply_norm(y, self.norm_fn, p4, name="norm1", train=bn_train, num_groups=g)
        y = nn.relu(y)
        y = conv(p4, 3, self.stride, 1, name="conv2")(y)
        y = apply_norm(y, self.norm_fn, p4, name="norm2", train=bn_train, num_groups=g)
        y = nn.relu(y)
        y = conv(self.planes, 1, 1, 0, name="conv3")(y)
        y = apply_norm(y, self.norm_fn, self.planes, name="norm3", train=bn_train, num_groups=g)
        y = nn.relu(y)

        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, 0, name="downsample_conv")(x)
            x = apply_norm(
                x, self.norm_fn, self.planes, name="downsample_norm", train=bn_train, num_groups=g
            )

        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: bool = None):
        bn_train = train if bn_train is None else bn_train
        x = conv(64, 7, 2, 3, name="conv1")(x)
        x = apply_norm(x, self.norm_fn, 64, name="norm1", train=bn_train, num_groups=8)
        x = nn.relu(x)

        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)], start=1):
            x = ResidualBlock(dim, self.norm_fn, stride, name=f"layer{i}_0")(x, train, bn_train)
            x = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{i}_1")(x, train, bn_train)

        x = conv(self.output_dim, 1, 1, 0, name="conv2")(x)

        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2), deterministic=False)(x)
        return x


class SmallEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, bn_train: bool = None):
        bn_train = train if bn_train is None else bn_train
        x = conv(32, 7, 2, 3, name="conv1")(x)
        x = apply_norm(x, self.norm_fn, 32, name="norm1", train=bn_train, num_groups=8)
        x = nn.relu(x)

        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)], start=1):
            x = BottleneckBlock(dim, self.norm_fn, stride, name=f"layer{i}_0")(x, train, bn_train)
            x = BottleneckBlock(dim, self.norm_fn, 1, name=f"layer{i}_1")(x, train, bn_train)

        x = conv(self.output_dim, 1, 1, 0, name="conv2")(x)

        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, broadcast_dims=(1, 2), deterministic=False)(x)
        return x
