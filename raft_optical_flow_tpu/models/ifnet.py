"""IFNet (RIFE) flow network — multi-scale frame-interpolation flow (TPU-native Flax).

Parity target: `IFNET_m.py:71-252` (IFNet_m_flow). 3 cascaded IFBlocks (c=240/150/90)
at scales 4/2/1: each block downsamples its input by 1/scale, runs a 2-conv
downsampler + 8-conv residual trunk + deconv head, upsamples the 5-channel output
(4ch bidirectional flow + 1ch mask) back, and the flows/masks accumulate residually
across blocks. Images are warped by the current flow halves between blocks
(grid_sample align_corners=True, padding_mode='border', `IFNET_m.py:7-21`).

Used here as a flow estimator: the reference trainer takes flow[..., 2:4] (the
img1 -> img0 direction) as the flow prediction (`IFNET_train.py:256`).

Module names mirror the torch state_dict (conv0_0_0, convblock_3_0, lastconv, ...);
PReLU slopes land on a `scale` param (the converter maps 1-D `weight` there).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from raft_optical_flow_tpu.models import layers
from raft_optical_flow_tpu.models.layers import TorchConvTranspose, conv
from raft_optical_flow_tpu.ops.grid import resize_bilinear
from raft_optical_flow_tpu.ops.warp import backward_warp


class PReLU(nn.Module):
    """Per-channel PReLU, torch init 0.25. Param named `scale` ([C])."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "scale", nn.initializers.constant(0.25), (x.shape[-1],)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class IFBlock(nn.Module):
    """One scale level (`IFNET_m.py:71-149`).

    `out_hw` is the cascade's full resolution; x/flow may arrive either at
    full res (reference layout — the block downsamples them itself) or
    already at (out_hw // scale) with flow pre-scaled (the feature_res_warp
    path builds them there so the warp gathers run on 1/scale^2 the rows).
    """

    c: int = 64

    @nn.compact
    def __call__(self, x, flow: Optional[jax.Array], scale: int, out_hw=None):
        if out_hw is None:
            out_hw = x.shape[1:3]
        H, W = out_hw
        tgt = (H // scale, W // scale)
        if x.shape[1:3] != tgt:
            x = resize_bilinear(x, tgt)
        if flow is not None:
            if flow.shape[1:3] != tgt:
                flow = resize_bilinear(flow, tgt) * (1.0 / scale)
            x = jnp.concatenate([x, flow], axis=-1)

        c = self.c
        x = PReLU(name="conv0_0_1")(conv(c // 2, 3, 2, 1, name="conv0_0_0")(x))
        x = PReLU(name="conv0_1_1")(conv(c, 3, 2, 1, name="conv0_1_0")(x))
        y = x
        for i in range(8):
            y = PReLU(name=f"convblock_{i}_1")(
                conv(c, 3, 1, 1, name=f"convblock_{i}_0")(y)
            )
        x = y + x
        tmp = TorchConvTranspose(5, 4, 2, 1, name="lastconv")(x)
        tmp = resize_bilinear(tmp, (H, W))
        return tmp[..., :4] * (scale * 2.0), tmp[..., 4:5]


class IFNet(nn.Module):
    """3-block cascade (`IFNET_m.py:151-252`).

    __call__(img0, img1 [N,H,W,3], scale, timestep) ->
      (flow_list, mask_list, warped_list): flow [N,H,W,4] per block (accumulated),
      mask sigmoid [N,H,W,1], warped (w0, w1) image pairs.
    """

    # bf16 mixed-precision policy (see LFN3Config.compute_dtype): the IFBlock
    # conv trunks compute bf16; flow/mask accumulate fp32 across blocks and the
    # full-res warps run on fp32 images with fp32 coordinates (the warp gathers
    # are issue-rate-bound, not byte-bound — BENCH.md packed-tap note — so bf16
    # there would cost fidelity for no speed).
    compute_dtype: Any = jnp.float32
    # feature_res_warp: build each block's input at its own (H/scale, W/scale)
    # resolution and warp THERE — warp(resize(img), resize(flow)/s) instead of
    # resize(warp(img, flow)). The gathers are issue-rate-bound (cost ~ rows),
    # so a scale-2 block's warp pair drops to 1/4 the rows. Exact for every
    # non-warped input channel (bilinear resize is channelwise linear, so
    # resize(concat) == concat(resize)); the two warped channels commute the
    # resize past the warp, an approximation that holds to O(flow curvature).
    # Off by default — golden parity (test_ifnet_parity) uses the reference
    # order; the serving configuration enables it (bench_families `frw` rows,
    # closeness gated by test_ifnet_feature_res_warp_close).
    feature_res_warp: bool = False

    @nn.compact
    def __call__(
        self,
        img0: jax.Array,
        img1: jax.Array,
        scale: Sequence[int] = (4, 2, 1),
        timestep: float = 0.5,
    ):
        with layers.compute_dtype_scope(self.compute_dtype):
            return self._forward(img0, img1, scale, timestep)

    def _forward(
        self,
        img0: jax.Array,
        img1: jax.Array,
        scale: Sequence[int] = (4, 2, 1),
        timestep: float = 0.5,
    ):
        ts = jnp.full(img0.shape[:-1] + (1,), timestep, img0.dtype)
        blocks = [
            IFBlock(240, name="block0"),
            IFBlock(150, name="block1"),
            IFBlock(90, name="block2"),
        ]

        N, H, W, _ = img0.shape
        flow_list: List[jax.Array] = []
        mask_list: List[jax.Array] = []
        warped_list = []
        warped_img0, warped_img1 = img0, img1
        flow = mask = None
        for i, block in enumerate(blocks):
            s = scale[i]
            if flow is not None:
                if self.feature_res_warp and s != 1:
                    # build the block input directly at (H/s, W/s): resize the
                    # non-warp channels (exact — see feature_res_warp note)
                    # and warp the already-downsampled images by the
                    # already-downsampled flow (1/s^2 the gather rows)
                    tgt = (H // s, W // s)
                    img0_s = resize_bilinear(img0, tgt)
                    img1_s = resize_bilinear(img1, tgt)
                    flow_s = resize_bilinear(flow, tgt) * (1.0 / s)
                    w0 = backward_warp(img0_s, flow_s[..., :2], padding="border")
                    w1 = backward_warp(img1_s, flow_s[..., 2:4], padding="border")
                    x = jnp.concatenate(
                        [img0_s, img1_s,
                         jnp.full((N,) + tgt + (1,), timestep, img0.dtype),
                         w0, w1, resize_bilinear(mask, tgt)], axis=-1)
                    flow_d, mask_d = block(x, flow_s, scale=s, out_hw=(H, W))
                else:
                    flow_d, mask_d = block(
                        jnp.concatenate(
                            [img0, img1, ts, warped_img0, warped_img1, mask],
                            axis=-1,
                        ),
                        flow,
                        scale=s,
                    )
                # residual accumulation in fp32: each block's deconv head
                # rounds its own delta once (bf16 policy); the accumulated
                # flow — used as warp coordinates — must not re-round
                flow = flow + flow_d.astype(jnp.float32)
                mask = mask + mask_d.astype(jnp.float32)
            else:
                flow, mask = block(
                    jnp.concatenate([img0, img1, ts], axis=-1), None, scale=s
                )
                flow = flow.astype(jnp.float32)
                mask = mask.astype(jnp.float32)
            mask_list.append(nn.sigmoid(mask))
            flow_list.append(flow)
            # full-res warps: the warped_list outputs always; the next block's
            # input only on the reference path (under feature_res_warp a
            # flow-only caller lets XLA DCE these entirely)
            warped_img0 = backward_warp(img0, flow[..., :2], padding="border")
            warped_img1 = backward_warp(img1, flow[..., 2:4], padding="border")
            warped_list.append((warped_img0, warped_img1))
        return flow_list, mask_list, warped_list
