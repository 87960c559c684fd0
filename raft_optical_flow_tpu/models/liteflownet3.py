"""LiteFlowNet3 family — TPU-native Flax implementation (standard / S / ±PseudoReg).

Parity target: `liteflownet3_simple.py:16-1173`. Architecture (4-level coarse-to-fine,
strides 32 -> 4; per level: FlowFieldDeformation -> CostVolumeModulation (level >=
min_mod_level) -> Matching -> SubPixel -> Regularization), internal flows scaled by
div_flow=20 with per-level multiplier 20 / 2^(5-i) (`liteflownet3_simple.py:228-230`).
Variants (`:745-821`): standard (min_mod_level=2) vs S (=1); optional PseudoReg final
2x stage replacing the 4x up-deconv.

TPU-first notes:
  - NHWC throughout; the frame pair is batch-folded through the feature extractor.
  - The 9x9 cost volumes are static shift-and-multiply windows (ops/spatial_corr.py)
    — pad + slice + fused multiply-reduce, no gathers.
  - The unfold-based flow smoothing in Regularization is expressed as k^2 static
    shifted slices (zero pad), which XLA fuses into the weighted sum.
  - Module names mirror the torch state_dict (convs_1_0, feat_net_2, ...) so
    converted reference checkpoints load 1:1 (utils/torch_convert.py).

Input/output contract (matches the reference driver usage,
`evaluate_liteflownet3.py:140-160`): images [B, 2, H, W, 3] in [0, 1]; returns a dict
with "flows" [B, 1, H, W, 2], "confs" [B, 1, H, W, 1], plus "flow_preds"/"conf_preds"
pyramids when training=True.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from raft_optical_flow_tpu.models import layers
from raft_optical_flow_tpu.models.layers import conv, deconv, leaky_relu
from raft_optical_flow_tpu.ops.grid import resize_bilinear
from raft_optical_flow_tpu.ops.padding import InputScaler
from raft_optical_flow_tpu.ops.spatial_corr import spatial_correlation_sample
from raft_optical_flow_tpu.ops.warp import warp_lfn3


@dataclasses.dataclass(frozen=True)
class LFN3Config:
    div_flow: float = 20.0
    use_pseudo_regularization: bool = False
    use_s_version: bool = False
    num_levels: int = 4
    output_stride: int = 32
    # bf16 for mixed-precision serving (the reference's autocast analog,
    # `train_mixed.sh` / `core/raft.py:12-22`): conv/feature compute runs bf16,
    # params stay fp32, and everything position-like stays fp32 — flow/conf
    # carried between modules, warp coordinates (ops/warp.py builds fp32 coords
    # regardless), correlation accumulation (ops/spatial_corr.py accumulates
    # fp32). The only bf16 roundings on the flow path are the conv heads' own
    # outputs.
    compute_dtype: Any = jnp.float32

    @property
    def min_mod_level(self) -> int:
        return 1 if self.use_s_version else 2

    def mult(self, level: int) -> float:
        # `liteflownet3_simple.py:228-230`: div_flow / 2^(num_levels - i + 1)
        return self.div_flow / 2 ** (self.num_levels - level + 1)


def _unfold_neighbors(x: jax.Array, k: int) -> jax.Array:
    """All k x k neighborhoods of [N, H, W, 1] as [N, H, W, k*k], zero padded.

    Channel ky*k + kx = offset (ky - k//2, kx - k//2): torch
    `nn.Unfold(k, padding=k//2)` row-major enumeration.
    """
    N, H, W, _ = x.shape
    p = k // 2
    xp = jnp.pad(x[..., 0], ((0, 0), (p, p), (p, p)))
    taps = [xp[:, ky : ky + H, kx : kx + W] for ky in range(k) for kx in range(k)]
    return jnp.stack(taps, axis=-1)


class FeatureExtractor(nn.Module):
    """6-stage pyramid encoder; keeps strides 4/8/16/32 (`liteflownet3_simple.py:16-99`)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        # x: [B*2, H, W, 3]
        x = leaky_relu(conv(32, 7, 1, 3, name="convs_0_0")(x))

        x = leaky_relu(conv(32, 3, 2, 1, name="convs_1_0")(x))
        x = leaky_relu(conv(32, 3, 1, 1, name="convs_1_2")(x))
        x = leaky_relu(conv(32, 3, 1, 1, name="convs_1_4")(x))

        feats = []
        x = leaky_relu(conv(64, 3, 2, 1, name="convs_2_0")(x))
        x = leaky_relu(conv(64, 3, 1, 1, name="convs_2_2")(x))
        feats.append(x)  # stride 4
        x = leaky_relu(conv(96, 3, 2, 1, name="convs_3_0")(x))
        x = leaky_relu(conv(96, 3, 1, 1, name="convs_3_2")(x))
        feats.append(x)  # stride 8
        x = leaky_relu(conv(128, 3, 2, 1, name="convs_4_0")(x))
        feats.append(x)  # stride 16
        x = leaky_relu(conv(192, 3, 2, 1, name="convs_5_0")(x))
        feats.append(x)  # stride 32
        return feats[::-1]  # coarse -> fine


class FlowFieldDeformation(nn.Module):
    """Self-correlation-driven flow warp + confidence (`liteflownet3_simple.py:102-211`)."""

    level: int

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array, flow, conf):
        patch_size = [None, 5, 7, 9][self.level]
        pred_k = [None, 3, 5, 5][self.level]

        conf = deconv(1, 4, 2, 1, name="up_conf", use_bias=False)(conf)
        flow = deconv(2, 4, 2, 1, name="up_flow", use_bias=False, groups=2)(flow)

        self_corr = leaky_relu(
            spatial_correlation_sample(f1, f1, patch_size, dilation_patch=2)
        )
        self_corr = self_corr / f1.shape[-1]

        x = jnp.concatenate([self_corr, conf], axis=-1)
        x = leaky_relu(conv(128, 3, 1, 1, name="feat_net_0")(x))
        x = leaky_relu(conv(64, 3, 1, 1, name="feat_net_2")(x))
        x = leaky_relu(conv(32, 3, 1, 1, name="feat_net_4")(x))

        disp = conv(2, pred_k, 1, pred_k // 2, name="disp_pred")(x)
        # warp the flow field by the predicted displacement (`:195-200`)
        flow = warp_lfn3(flow, disp, 1.0)
        conf = nn.sigmoid(conv(1, pred_k, 1, pred_k // 2, name="conf_pred_0")(x))
        return flow, conf


class CostVolumeModulation(nn.Module):
    """9x9 cost volume with learned scalar/offset modulation (`liteflownet3_simple.py:214-319`)."""

    level: int
    cfg: LFN3Config

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array, flow, conf):
        mult = self.cfg.mult(self.level)
        warped2 = warp_lfn3(f2, flow, 1.0 / mult)
        corr = leaky_relu(spatial_correlation_sample(f1, warped2, 9))
        corr = corr / f1.shape[-1]

        x = jnp.concatenate([f1, corr, conf], axis=-1)
        x = leaky_relu(conv(128, 3, 1, 1, name="feat_net_0")(x))
        x = leaky_relu(conv(64, 3, 1, 1, name="feat_net_2")(x))

        s = leaky_relu(conv(32, 3, 1, 1, name="mod_scalar_net_0")(x))
        mod_scalar = conv(81, 1, 1, 0, name="mod_scalar_net_2")(s)
        o = leaky_relu(conv(32, 3, 1, 1, name="mod_offset_net_0")(x))
        mod_offset = conv(81, 1, 1, 0, name="mod_offset_net_2")(o)
        return mod_scalar * corr + mod_offset


class Matching(nn.Module):
    """Cost volume -> residual flow (`liteflownet3_simple.py:322-436`)."""

    level: int
    cfg: LFN3Config

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array, flow, corr):
        flow_k = [3, 3, 5, 5][self.level]
        mult = self.cfg.mult(self.level)

        if self.level == 1 and not self.cfg.use_s_version:
            flow = deconv(2, 4, 2, 1, name="up_flow", use_bias=False, groups=2)(flow)

        if corr is None:
            warped2 = f2
            if flow is not None:
                warped2 = warp_lfn3(f2, flow, 1.0 / mult)
            corr = leaky_relu(spatial_correlation_sample(f1, warped2, 9))
            corr = corr / f1.shape[-1]

        x = leaky_relu(conv(128, 3, 1, 1, name="flow_net_0")(corr))
        x = leaky_relu(conv(128, 3, 1, 1, name="flow_net_2")(x))
        x = leaky_relu(conv(96, 3, 1, 1, name="flow_net_4")(x))
        x = leaky_relu(conv(64, 3, 1, 1, name="flow_net_6")(x))
        x = leaky_relu(conv(32, 3, 1, 1, name="flow_net_8")(x))
        new_flow = conv(2, flow_k, 1, flow_k // 2, name="flow_net_10")(x)
        if flow is not None:
            new_flow = flow + new_flow
        return new_flow


class SubPixel(nn.Module):
    """Warp-and-refine residual flow (`liteflownet3_simple.py:439-476`)."""

    level: int
    cfg: LFN3Config

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array, flow):
        flow_k = [3, 3, 5, 5][self.level]
        mult = self.cfg.mult(self.level)

        warped2 = warp_lfn3(f2, flow, 1.0 / mult)
        x = jnp.concatenate([f1, warped2, flow], axis=-1)
        x = leaky_relu(conv(128, 3, 1, 1, name="feat_net_0")(x))
        x = leaky_relu(conv(128, 3, 1, 1, name="feat_net_2")(x))
        x = leaky_relu(conv(96, 3, 1, 1, name="feat_net_4")(x))
        x = leaky_relu(conv(64, 3, 1, 1, name="feat_net_6")(x))
        x = leaky_relu(conv(32, 3, 1, 1, name="feat_net_8")(x))
        new_flow = flow + conv(2, flow_k, 1, flow_k // 2, name="flow_net")(x)
        return new_flow, x


class Regularization(nn.Module):
    """Distance-softmax adaptive flow smoothing (`liteflownet3_simple.py:479-681`)."""

    level: int
    cfg: LFN3Config

    @nn.compact
    def __call__(self, img1, img2, f1, flow):
        flow_k = [3, 3, 5, 5][self.level]
        conf_k = [3, 3, 5, None][self.level]
        mult = self.cfg.mult(self.level)

        img2_warped = warp_lfn3(img2, flow, 1.0 / mult)
        # The 1e-12 keeps d(sqrt)/dx finite where the warped diff is exactly 0
        # (the reference, `liteflownet3_simple.py:531`, only ever runs inference
        # through this norm; training through sqrt(0) produces NaN gradients —
        # observed as lfn3_unsup divergence). Forward delta is < 1e-6 px,
        # far inside the golden-parity budget.
        img_diff_norm = jnp.sqrt(
            jnp.sum((img1 - img2_warped) ** 2, axis=-1, keepdims=True) + 1e-12
        )

        flow_mean = flow.mean(axis=(1, 2), keepdims=True)
        flow_nomean = flow - flow_mean

        feat = f1
        if self.level >= 2:
            feat = leaky_relu(conv(128, 1, 1, 0, name="feat_conv_0")(f1))

        x = jnp.concatenate([img_diff_norm, flow_nomean, feat], axis=-1)
        x = leaky_relu(conv(128, 3, 1, 1, name="feat_net_0")(x))
        x = leaky_relu(conv(128, 3, 1, 1, name="feat_net_2")(x))
        x = leaky_relu(conv(64, 3, 1, 1, name="feat_net_4")(x))
        x = leaky_relu(conv(64, 3, 1, 1, name="feat_net_6")(x))
        x = leaky_relu(conv(32, 3, 1, 1, name="feat_net_8")(x))
        x = leaky_relu(conv(32, 3, 1, 1, name="feat_net_10")(x))

        if self.level < 2:
            dist = conv(flow_k**2, 3, 1, 1, name="dist")(x)
        else:
            dist = conv(
                flow_k**2, (flow_k, 1), 1, (flow_k // 2, 0), name="dist_0"
            )(x)
            dist = conv(
                flow_k**2, (1, flow_k), 1, (0, flow_k // 2), name="dist_1"
            )(dist)

        dist = -jnp.square(dist)
        dist = jnp.exp(dist - dist.max(axis=-1, keepdims=True))
        div = dist.sum(axis=-1, keepdims=True)

        fx = _unfold_neighbors(flow[..., 0:1], flow_k)
        fy = _unfold_neighbors(flow[..., 1:2], flow_k)
        flow_x = jnp.sum(fx * dist, axis=-1, keepdims=True) / div
        flow_y = jnp.sum(fy * dist, axis=-1, keepdims=True) / div
        flow = jnp.concatenate([flow_x, flow_y], axis=-1)

        conf = None
        if not ((self.level == 0 and not self.cfg.use_s_version) or self.level == 3):
            conf = nn.sigmoid(
                conv(1, conf_k, 1, conf_k // 2, name="conf_pred_0")(x)
            )
        return flow, conf, x


class PseudoSubpixel(nn.Module):
    """2x flow upsample + residual from subpixel features (`liteflownet3_simple.py:684-695`)."""

    @nn.compact
    def __call__(self, sub_feat, flow):
        up = deconv(2, 4, 2, 1, name="up_flow", use_bias=False, groups=2)(flow)
        x = deconv(32, 4, 2, 1, name="flow_net_0")(sub_feat)
        return up + conv(2, 7, 1, 3, name="flow_net_1")(x)


class PseudoRegularization(nn.Module):
    """2x-resolution separable distance smoothing (`liteflownet3_simple.py:698-730`)."""

    @nn.compact
    def __call__(self, reg_feat, flow):
        x = deconv(32, 4, 2, 1, name="feat_net_0")(reg_feat)
        x = conv(49, (7, 1), 1, (3, 0), name="feat_net_1")(x)
        dist = conv(49, (1, 7), 1, (0, 3), name="feat_net_2")(x)

        dist = -jnp.square(dist)
        dist = jnp.exp(dist - dist.max(axis=-1, keepdims=True))
        div = dist.sum(axis=-1, keepdims=True)

        fx = _unfold_neighbors(flow[..., 0:1], 7)
        fy = _unfold_neighbors(flow[..., 1:2], 7)
        flow_x = jnp.sum(fx * dist, axis=-1, keepdims=True) / div
        flow_y = jnp.sum(fy * dist, axis=-1, keepdims=True) / div
        return jnp.concatenate([flow_x, flow_y], axis=-1)


class LiteFlowNet3(nn.Module):
    """Coarse-to-fine flow estimator (`liteflownet3_simple.py:733-929`).

    __call__(images, training): images [B, 2, H, W, 3] in [0, 1].
    """

    config: LFN3Config = LFN3Config()

    @nn.compact
    def __call__(self, images: jax.Array, training: bool = False):
        with layers.compute_dtype_scope(self.config.compute_dtype):
            return self._forward(images, training)

    def _forward(self, images: jax.Array, training: bool = False):
        cfg = self.config
        B = images.shape[0]

        # preprocess (`liteflownet3_simple.py:838-847`): bgr_add (means, BGR order),
        # BGR->RGB channel flip, bilinear resize to /32 (align_corners=False).
        bgr_add = jnp.array([-0.454253, -0.434631, -0.411618], images.dtype)
        x = images + bgr_add
        x = x[..., ::-1]
        scaler = InputScaler(images.shape, stride=cfg.output_stride)
        x = scaler.fill(x.reshape(B * 2, *images.shape[2:])).reshape(
            B, 2, scaler.tgt_ht, scaler.tgt_wd, 3
        )

        feats_flat = FeatureExtractor(name="feature_net")(
            x.reshape(B * 2, *x.shape[2:])
        )
        # [(f1, f2)] coarse -> fine
        feats_pyr = [
            (f.reshape(B, 2, *f.shape[1:])[:, 0], f.reshape(B, 2, *f.shape[1:])[:, 1])
            for f in feats_flat
        ]
        images_pyr = [
            (
                resize_bilinear(x[:, 0], f1.shape[1:3]),
                resize_bilinear(x[:, 1], f1.shape[1:3]),
            )
            for f1, _ in feats_pyr
        ]

        flow_preds, conf_preds = [], []
        flow = conf = corr = None
        sub_feat = reg_feat = None

        # flow/conf are position-like: carried fp32 between modules under the
        # bf16 policy (each module's conv head rounds its own residual once;
        # the accumulated field must not re-round)
        f32 = lambda t: None if t is None else t.astype(jnp.float32)
        for i in range(cfg.num_levels):
            f1, f2 = feats_pyr[i]
            if i >= cfg.min_mod_level:
                j = i - cfg.min_mod_level
                flow, conf = FlowFieldDeformation(
                    i, name=f"deformation_nets_{j}"
                )(f1, f2, flow, conf)
                flow, conf = f32(flow), f32(conf)
                conf_preds.append(conf)
                corr = CostVolumeModulation(i, cfg, name=f"modulation_nets_{j}")(
                    f1, f2, flow, conf
                )
            flow = f32(Matching(i, cfg, name=f"matching_nets_{i}")(f1, f2, flow, corr))
            flow, sub_feat = SubPixel(i, cfg, name=f"subpixel_nets_{i}")(f1, f2, flow)
            flow, conf, reg_feat = Regularization(
                i, cfg, name=f"regularization_nets_{i}"
            )(images_pyr[i][0], images_pyr[i][1], f1, flow)
            flow, conf = f32(flow), f32(conf)
            flow_preds.append(flow)
            if conf is not None:
                conf_preds.append(conf)
            corr = None

        if cfg.use_pseudo_regularization:
            flow = PseudoSubpixel(name="pseudo_subpixel")(sub_feat, flow)
            flow = PseudoRegularization(name="pseudo_regularization")(reg_feat, flow)
            flow = deconv(2, 4, 2, 1, name="up_flow", use_bias=False, groups=2)(flow)
        else:
            flow = deconv(2, 8, 4, 2, name="up_flow", use_bias=False, groups=2)(flow)
        flow = flow * cfg.div_flow
        flow = scaler.unfill(flow, is_flow=True)

        conf_full = resize_bilinear(
            conf_preds[-1],
            (conf_preds[-1].shape[1] * 4, conf_preds[-1].shape[2] * 4),
        )
        conf_full = scaler.unfill(conf_full)

        outputs = {"flows": flow[:, None], "confs": conf_full[:, None]}
        if training:
            outputs["flow_preds"] = flow_preds
            outputs["conf_preds"] = conf_preds
        return outputs


def liteflownet3(**kw) -> LiteFlowNet3:
    return LiteFlowNet3(LFN3Config(**kw))


def liteflownet3_pseudoreg(**kw) -> LiteFlowNet3:
    return LiteFlowNet3(LFN3Config(use_pseudo_regularization=True, **kw))


def liteflownet3s(**kw) -> LiteFlowNet3:
    return LiteFlowNet3(LFN3Config(use_s_version=True, **kw))


def liteflownet3s_pseudoreg(**kw) -> LiteFlowNet3:
    return LiteFlowNet3(
        LFN3Config(use_s_version=True, use_pseudo_regularization=True, **kw)
    )
