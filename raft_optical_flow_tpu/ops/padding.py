"""Input padding / rescaling to stride-divisible sizes.

Parity targets:
  - `core/utils/utils.py:7-24` — `InputPadder`: pad to divisible-by-8 with replicate
    padding; 'sintel' centers the pad, 'kitti' pads top only (pad list order is
    [left, right, top, bottom] in torch F.pad convention).
  - `liteflownet3_util.py:18-118` — generalized stride + `liteflownet3_util.py:121-241`
    `InputScaler`: bilinear rescale to a divisible size, multiplying flow values on the
    way back.

These run on host or device; they are pure functions of static shapes so they are
jit-compatible (shapes fixed at trace time).
"""

from __future__ import annotations

import jax.numpy as jnp

from raft_optical_flow_tpu.ops.grid import resize_bilinear


class InputPadder:
    """Pads NHWC images so H and W are divisible by `stride`.

    `mode='sintel'` centers the pad, 'kitti' pads bottom only
    (`core/utils/utils.py:7-24`); the generalized options mirror
    `liteflownet3_util.py:18-118`: any stride, `pad_mode` ('replicate' |
    'constant' with `pad_value`), `two_side_pad`, and an optional `fixed_size`
    target instead of the next multiple of stride.
    """

    def __init__(self, dims, mode: str = "sintel", stride: int = 8,
                 pad_mode: str = "replicate", pad_value: float = 0.0,
                 two_side_pad: bool = True, fixed_size=None):
        # dims: shape tuple [..., H, W, C]
        self.ht, self.wd = dims[-3], dims[-2]
        if fixed_size is not None:
            tgt_ht, tgt_wd = fixed_size
            pad_ht = max(tgt_ht - self.ht, 0)
            pad_wd = max(tgt_wd - self.wd, 0)
        else:
            pad_ht = (((self.ht // stride) + 1) * stride - self.ht) % stride
            pad_wd = (((self.wd // stride) + 1) * stride - self.wd) % stride
        if mode == "kitti":
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)
        elif two_side_pad:
            # (left, right, top, bottom)
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2)
        else:
            self._pad = (0, pad_wd, 0, pad_ht)
        self._pad_mode = pad_mode
        self._pad_value = pad_value

    def pad(self, *inputs):
        l, r, t, b = self._pad
        widths = ((0, 0), (t, b), (l, r), (0, 0))
        if self._pad_mode == "replicate":
            out = [jnp.pad(x, widths, mode="edge") for x in inputs]
        else:
            out = [
                jnp.pad(x, widths, mode="constant", constant_values=self._pad_value)
                for x in inputs
            ]
        return out if len(out) > 1 else out[0]

    def unpad(self, x):
        l, r, t, b = self._pad
        ht, wd = x.shape[-3], x.shape[-2]
        return x[..., t : ht - b, l : wd - r, :]


class InputScaler:
    """Bilinearly rescales NHWC inputs to a stride-divisible size and back.

    `unfill` on a flow field rescales the flow *values* by the size ratio, matching
    `liteflownet3_util.py:189-241`.
    """

    def __init__(self, dims, stride: int = 32, interpolation_align_corners: bool = False):
        self.orig_ht, self.orig_wd = dims[-3], dims[-2]
        self.tgt_ht = int(-(-self.orig_ht // stride) * stride)
        self.tgt_wd = int(-(-self.orig_wd // stride) * stride)

    def fill(self, x):
        return resize_bilinear(x, (self.tgt_ht, self.tgt_wd))

    def unfill(self, x, is_flow: bool = False):
        out = resize_bilinear(x, (self.orig_ht, self.orig_wd))
        if is_flow:
            scale = jnp.array(
                [self.orig_wd / self.tgt_wd, self.orig_ht / self.tgt_ht], dtype=out.dtype
            )
            out = out * scale
        return out
