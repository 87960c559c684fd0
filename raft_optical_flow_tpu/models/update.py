"""RAFT update blocks: motion encoders, Conv/SepConv GRUs, flow + mask heads.

Parity targets: `core/update.py` —
  - FlowHead (:6-28), ConvGRU (:30-72), SepConvGRU (:74-121, horizontal 1x5 then
    vertical 5x1 GRU passes),
  - SmallMotionEncoder (:123-167), BasicMotionEncoder (:169-216),
  - SmallUpdateBlock (:218-263, mask=None), BasicUpdateBlock (:265-325, mask head
    scaled x0.25).

Submodule names mirror the torch attribute paths (mask.0 -> mask_0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from raft_optical_flow_tpu.models.layers import TORCH_DEFAULT_INIT, conv


class _ConvParams(nn.Module):
    """Declares a conv's kernel/bias params (same paths, shapes, and init as
    nn.Conv) without running the conv — the fused GRU kernel consumes the raw
    arrays instead."""

    features: int
    kernel_size: tuple
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            TORCH_DEFAULT_INIT,
            (*self.kernel_size, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class FlowHead(nn.Module):
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(conv(self.hidden_dim, 3, 1, 1, name="conv1")(x))
        return conv(2, 3, 1, 1, name="conv2")(x)


class ConvGRU(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv(self.hidden_dim, 3, 1, 1, name="convz")(hx))
        r = nn.sigmoid(conv(self.hidden_dim, 3, 1, 1, name="convr")(hx))
        q = jnp.tanh(
            conv(self.hidden_dim, 3, 1, 1, name="convq")(jnp.concatenate([r * h, x], axis=-1))
        )
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    # opt-in fused Pallas step (kernels/gru_fused.py): both directional passes
    # run as single VMEM-resident kernels — measured ~10% faster than the six
    # XLA convs at Sintel size. Default off: the fused path reorders bf16
    # roundings (conv(cat(h,x)) becomes conv(h)+conv(x)), so exact golden
    # parity is only guaranteed on the default path. Same param tree either way.
    fused: bool = False

    @nn.compact
    def __call__(self, h, x):
        d = self.hidden_dim
        if self.fused:
            from raft_optical_flow_tpu.kernels.gru_fused import (
                sepconv_gru_pallas,
                sepconv_gru_reference,
            )

            cin = h.shape[-1] + x.shape[-1]
            params = {}
            for suffix, ks in (("1", (1, 5)), ("2", (5, 1))):
                for gate in "zrq":
                    params[f"conv{gate}{suffix}"] = _ConvParams(
                        d, ks, cin, name=f"conv{gate}{suffix}"
                    )()
            if jax.default_backend() == "cpu":
                return sepconv_gru_reference(h, x, params)
            return sepconv_gru_pallas(h, x, params)
        # horizontal pass (1x5 kernels)
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv(d, (1, 5), 1, (0, 2), name="convz1")(hx))
        r = nn.sigmoid(conv(d, (1, 5), 1, (0, 2), name="convr1")(hx))
        q = jnp.tanh(
            conv(d, (1, 5), 1, (0, 2), name="convq1")(jnp.concatenate([r * h, x], axis=-1))
        )
        h = (1 - z) * h + z * q

        # vertical pass (5x1 kernels)
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv(d, (5, 1), 1, (2, 0), name="convz2")(hx))
        r = nn.sigmoid(conv(d, (5, 1), 1, (2, 0), name="convr2")(hx))
        q = jnp.tanh(
            conv(d, (5, 1), 1, (2, 0), name="convq2")(jnp.concatenate([r * h, x], axis=-1))
        )
        return (1 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(conv(96, 1, 1, 0, name="convc1")(corr))
        flo = nn.relu(conv(64, 7, 1, 3, name="convf1")(flow))
        flo = nn.relu(conv(32, 3, 1, 1, name="convf2")(flo))
        out = nn.relu(conv(80, 3, 1, 1, name="conv")(jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 82 channels


class BasicMotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(conv(256, 1, 1, 0, name="convc1")(corr))
        cor = nn.relu(conv(192, 3, 1, 1, name="convc2")(cor))
        flo = nn.relu(conv(128, 7, 1, 3, name="convf1")(flow))
        flo = nn.relu(conv(64, 3, 1, 1, name="convf2")(flo))
        out = nn.relu(conv(126, 3, 1, 1, name="conv")(jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class SmallUpdateBlock(nn.Module):
    hidden_dim: int = 96

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, name="gru")(net, x)
        delta = FlowHead(128, name="flow_head")(net)
        return net, None, delta


class BasicUpdateBlock(nn.Module):
    hidden_dim: int = 128
    fused_gru: bool = False

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, self.fused_gru, name="gru")(net, x)
        delta = FlowHead(256, name="flow_head")(net)
        mask = nn.relu(conv(256, 3, 1, 1, name="mask_0")(net))
        mask = 0.25 * conv(64 * 9, 1, 1, 0, name="mask_2")(mask)
        return net, mask, delta
