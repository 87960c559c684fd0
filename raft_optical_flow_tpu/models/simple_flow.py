"""SimpleFlowNet — small 3-scale coarse-to-fine flow network (TPU-native Flax).

Parity target: `simple_flow_net.py:6-559`. Architecture:
  - FeatureExtractor (`:192-267`): 7x7/s2 conv+BN+ReLU -> 5 BN ResidualBlocks,
    keeping features at 1/2 (32ch), 1/4 (64ch), 1/8 (128ch).
  - CorrelationLayer (`:346-465`): L2-normalized features, 9x9 integer shift window
    (dy-major channel order, zeros at borders), corr[k] = <f1(x), f2(x - (dx, dy))>.
  - FlowDecoder (`:468-559`): [corr(81) + prev_flow(2)] -> 128 -> 64 -> 32 -> 2;
    zero-flow injected at the coarsest scale.
  - Coarse-to-fine (`:50-131`): upsample prev flow (align_corners=False, per-axis
    value scaling), warp feat2 by prev_flow*20 (grid_sample align_corners=True,
    zeros), residual add; all outputs returned x20, coarse-first [1/8, 1/4, 1/2].

Internal flows are /20 units; the x20 happens once at the output and in the warp.
Module names mirror the torch state_dict for the checkpoint converter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from raft_optical_flow_tpu.models import layers
from raft_optical_flow_tpu.models.layers import conv
from raft_optical_flow_tpu.ops.grid import resize_bilinear
from raft_optical_flow_tpu.ops.warp import backward_warp


@dataclasses.dataclass(frozen=True)
class SimpleFlowConfig:
    input_channels: int = 3
    feature_dim: int = 64
    max_displacement: int = 4
    flow_scale: float = 20.0
    # bf16 mixed-precision serving policy (see LFN3Config.compute_dtype):
    # conv/BN compute in bf16, params fp32, flow carried fp32, correlation
    # L2-norm stats + dot accumulation fp32 (correlation_layer below).
    compute_dtype: Any = jnp.float32


def _bn(name: str, train: bool):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=layers.scoped_dtype(), name=name,
    )


class SFResidualBlock(nn.Module):
    """BN residual block (`simple_flow_net.py:270-343`)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = conv(self.features, 3, self.stride, 1, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        y = conv(self.features, 3, 1, 1, name="conv2")(y)
        y = _bn("bn2", train)(y)
        if self.stride != 1 or in_ch != self.features:
            x = conv(self.features, 1, self.stride, 0, name="shortcut_0")(x)
            x = _bn("shortcut_1", train)(x)
        return nn.relu(x + y)


class SFFeatureExtractor(nn.Module):
    feature_dim: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        d = self.feature_dim
        x = conv(d // 2, 7, 2, 3, name="conv1_0")(x)
        x = nn.relu(_bn("conv1_1", train)(x))
        feats = []
        x = SFResidualBlock(d // 2, 1, name="res_block1")(x, train)
        feats.append(x)  # 1/2, 32
        x = SFResidualBlock(d, 2, name="res_block2")(x, train)
        x = SFResidualBlock(d, 1, name="res_block3")(x, train)
        feats.append(x)  # 1/4, 64
        x = SFResidualBlock(2 * d, 2, name="res_block4")(x, train)
        x = SFResidualBlock(2 * d, 1, name="res_block5")(x, train)
        feats.append(x)  # 1/8, 128
        return feats


def correlation_layer(f1: jax.Array, f2: jax.Array, max_displacement: int = 4) -> jax.Array:
    """9x9 shifted correlation of L2-normalized features (`simple_flow_net.py:346-465`).

    corr channel k = (dy + r) * (2r+1) + (dx + r) contains
    <f1_norm(x), f2_norm(x - (dx, dy))> with zeros where the shift leaves the image.
    """
    B, H, W, C = f1.shape
    r = max_displacement

    def l2norm(f):
        # clamp inside the sqrt: torch F.normalize clamps the norm, but in JAX
        # sqrt'(0) = inf leaks a NaN through the clamp (0 * inf); all-zero
        # post-ReLU feature vectors do occur at random init.
        # stats in fp32 (bf16 sum-of-squares over C loses the normalization)
        f32 = f.astype(jnp.float32)
        sumsq = jnp.sum(f32 * f32, axis=-1, keepdims=True)
        return (f32 / jnp.sqrt(jnp.maximum(sumsq, 1e-24))).astype(f.dtype)

    dtype = f1.dtype
    f1 = l2norm(f1)
    f2 = l2norm(f2)

    # shift_feature(dx, dy): shifted(x) = feat(x - (dx, dy)) via zero pad + slice
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, r - dy, r - dx, 0), (B, H, W, C)
            )
            # fp32 accumulation over C (upcasts fuse into the multiply-reduce);
            # one rounding back to the feature dtype at the stack
            outs.append(
                jnp.sum(
                    f1.astype(jnp.float32) * shifted.astype(jnp.float32), axis=-1
                )
            )
    return jnp.stack(outs, axis=-1).astype(dtype)


class SFFlowDecoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 81:  # coarsest level: inject zero flow (`:536-539`)
            zeros = jnp.zeros(x.shape[:-1] + (2,), x.dtype)
            x = jnp.concatenate([x, zeros], axis=-1)
        x = nn.relu(conv(128, 3, 1, 1, name="conv1_0")(x))
        x = nn.relu(conv(64, 3, 1, 1, name="conv2_0")(x))
        x = nn.relu(conv(32, 3, 1, 1, name="conv3_0")(x))
        return conv(2, 3, 1, 1, name="flow_conv")(x)


class SimpleFlowNet(nn.Module):
    """3-scale coarse-to-fine flow estimator.

    __call__(img1, img2, train) -> list of [B, H_i, W_i, 2] flows x flow_scale,
    coarse-first [1/8, 1/4, 1/2] like the reference.
    """

    config: SimpleFlowConfig = SimpleFlowConfig()

    @nn.compact
    def __call__(self, img1, img2, train: bool = False):
        with layers.compute_dtype_scope(self.config.compute_dtype):
            return self._forward(img1, img2, train)

    def _forward(self, img1, img2, train: bool = False):
        cfg = self.config
        extractor = SFFeatureExtractor(cfg.feature_dim, name="feature_extractor")
        feats1 = extractor(img1, train)
        feats2 = extractor(img2, train)
        decoder = SFFlowDecoder(name="flow_decoder")

        preds = []
        prev_flow = None
        for i in range(len(feats1) - 1, -1, -1):
            f1, f2 = feats1[i], feats2[i]
            if prev_flow is not None:
                h, w = f1.shape[1:3]
                ph, pw = prev_flow.shape[1:3]
                scale = jnp.array([w / pw, h / ph], prev_flow.dtype)
                prev_flow = resize_bilinear(prev_flow, (h, w)) * scale
                f2w = backward_warp(f2, prev_flow * cfg.flow_scale, padding="zeros")
                x = jnp.concatenate(
                    [correlation_layer(f1, f2w, cfg.max_displacement), prev_flow],
                    axis=-1,
                )
            else:
                x = correlation_layer(f1, f2, cfg.max_displacement)
            # flow carried fp32 across scales under the bf16 policy: only the
            # decoder head's own residual rounds (its conv output dtype)
            flow = decoder(x).astype(jnp.float32)
            if prev_flow is not None:
                flow = flow + prev_flow
            preds.append(flow)
            prev_flow = flow
        return [f * cfg.flow_scale for f in preds]
