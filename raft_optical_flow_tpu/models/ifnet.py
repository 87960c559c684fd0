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
    """One scale level (`IFNET_m.py:71-149`)."""

    c: int = 64

    @nn.compact
    def __call__(self, x, flow: Optional[jax.Array], scale: int):
        N, H, W, _ = x.shape
        if scale != 1:
            x = resize_bilinear(x, (H // scale, W // scale))
        if flow is not None:
            flow = resize_bilinear(flow, (H // scale, W // scale)) * (1.0 / scale)
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

        flow_list: List[jax.Array] = []
        mask_list: List[jax.Array] = []
        warped_list = []
        warped_img0, warped_img1 = img0, img1
        flow = mask = None
        for i, block in enumerate(blocks):
            if flow is not None:
                flow_d, mask_d = block(
                    jnp.concatenate(
                        [img0, img1, ts, warped_img0, warped_img1, mask], axis=-1
                    ),
                    flow,
                    scale=scale[i],
                )
                # residual accumulation in fp32: each block's deconv head
                # rounds its own delta once (bf16 policy); the accumulated
                # flow — used as warp coordinates — must not re-round
                flow = flow + flow_d.astype(jnp.float32)
                mask = mask + mask_d.astype(jnp.float32)
            else:
                flow, mask = block(
                    jnp.concatenate([img0, img1, ts], axis=-1), None, scale=scale[i]
                )
                flow = flow.astype(jnp.float32)
                mask = mask.astype(jnp.float32)
            mask_list.append(nn.sigmoid(mask))
            flow_list.append(flow)
            warped_img0 = backward_warp(img0, flow[..., :2], padding="border")
            warped_img1 = backward_warp(img1, flow[..., 2:4], padding="border")
            warped_list.append((warped_img0, warped_img1))
        return flow_list, mask_list, warped_list
