"""RAFT (Recurrent All-Pairs Field Transforms) — TPU-native Flax implementation.

Parity target: `core/raft.py` (model config :42-53, normalization :164-165, batch-folded
fnet :177-182, corr fp32 :181-182, cnet split+tanh/relu :193-200, iteration loop
:214-243 with per-step `coords1.detach()`, convex upsample :112-142, test/train returns
:246-251).

TPU-first design choices (not translations):
  - NHWC layout; the two frames are batch-folded through fnet in one conv pass.
  - The GRU recurrence is a single `lax.scan` (via nn.scan) — one compiled step reused
    for all iterations, instead of a Python loop of 12-32 unrolled graph copies.
  - `coords1.detach()` becomes `lax.stop_gradient` on the coordinate carry only;
    gradients still flow through `net` across iterations, like the reference.
  - All-pairs correlation is one MXU matmul + pooled pyramid; the windowed lookup is
    the per-iteration hot op (XLA gather fallback in ops/corr.py, Pallas kernel in
    kernels/corr_lookup.py).
  - In test mode the convex upsample runs once after the scan (outputs are identical
    to upsampling every iteration and discarding all but the last).
  - `alternate_corr=True` switches to the on-demand correlation (alt_cuda_corr
    equivalent) that never materializes the HW x HW volume. It matches the
    materialized path's in-model speed (BENCH.md correlation table) at zero
    volume memory: `alternate_corr=True, remat=True` is the recommended
    TRAINING configuration at Sintel resolution and above (it is the only one
    that fits 16 GB HBM at 768x1408+; BENCH.md memory table). For batched
    inference at <=Sintel size the materialized default is faster.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from raft_optical_flow_tpu.models import layers
from raft_optical_flow_tpu.models.extractor import BasicEncoder, SmallEncoder
from raft_optical_flow_tpu.models.update import BasicUpdateBlock, SmallUpdateBlock
from raft_optical_flow_tpu.ops.corr import (
    avg_pool2x2,
    build_corr_pyramid_from_fmaps,
    corr_pyramid_lookup,
)
from raft_optical_flow_tpu.ops.grid import coords_grid, upflow8
from raft_optical_flow_tpu.ops.upsample import convex_upsample


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    small: bool = False
    dropout: float = 0.0
    alternate_corr: bool = False
    corr_levels: int = 4
    corr_impl: str = "pallas"  # 'pallas' (TPU kernel; XLA fallback on CPU) | 'xla'
    compute_dtype: Any = jnp.float32  # bf16 for mixed precision; corr stays fp32
    # Rematerialize each GRU iteration in the backward pass: per-iteration
    # activations are recomputed instead of stored, cutting training HBM by
    # ~the iteration count at ~1 extra forward of FLOPs — the standard TPU
    # memory/compute trade (the reference has no equivalent; GradScaler+autocast
    # only shrinks dtype). Composes with alternate_corr for the minimum-memory
    # training configuration.
    remat: bool = False
    # jax.checkpoint on the per-iteration convex upsample in TRAINING mode:
    # recompute its ~262 MB/iter (bs4 368x496 fp32) intermediates in the
    # backward instead of storing them. Landed end-of-round-4 on trace evidence
    # (the step was DMA-bound) but MEASURED A REGRESSION in round 5
    # (tools/bench_train_ab.py: 152.6 vs 139.9 ms/step at bs4 368x496 — the
    # recompute costs more than the DMA it saves at crop scale). Default off;
    # available as a memory lever for shapes where HBM, not time, binds.
    checkpoint_upsample: bool = False
    # Fused Pallas SepConvGRU (kernels/gru_fused.py) — opt-in, standard model
    # only; see models/update.py:SepConvGRU.fused for the parity trade.
    fused_gru: bool = False

    @property
    def corr_radius(self) -> int:
        return 3 if self.small else 4

    @property
    def hidden_dim(self) -> int:
        return 96 if self.small else 128

    @property
    def context_dim(self) -> int:
        return 64 if self.small else 128


def _ondemand_corr_lookup(
    fmap1, fmap2_pyramid, coords, radius, corr_impl="pallas", precision=None,
    out_dtype=jnp.float32,
):
    """On-demand multi-level correlation: alt_cuda_corr equivalent.

    Computes <fmap1[q], fmap2_l[coords_l(q) + offset]> for the (2r+1)^2 window without
    materializing the all-pairs volume (`core/corr.py:130-198`). Channel order is
    dx-major, the same order CorrBlock produces — so both paths are interchangeable
    for trained weights. On TPU this runs the native Pallas kernels
    (kernels/corr_ondemand_pallas.py, fmap2 VMEM-resident, fwd + custom VJP); on CPU
    the XLA blockwise implementation (kernels/corr_ondemand.py).
    """
    from raft_optical_flow_tpu.kernels.corr_ondemand import ondemand_corr_pyramid

    impl = "xla" if corr_impl == "xla" else None
    return ondemand_corr_pyramid(
        fmap1, fmap2_pyramid, coords, radius, impl=impl, precision=precision,
        out_dtype=out_dtype,
    )


class RAFTIteration(nn.Module):
    """One GRU update step; scanned over iterations with broadcast params."""

    config: RAFTConfig
    test_mode: bool

    @nn.compact
    def __call__(self, carry, x):
        cfg = self.config
        carry_mask = self.test_mode and not cfg.small
        if carry_mask:
            net, coords1, _ = carry
        else:
            net, coords1 = carry
        inp, coords0, corr_state = x

        coords1 = jax.lax.stop_gradient(coords1)

        if cfg.alternate_corr:
            fmap1, f2_pyramid = corr_state
            # Same precision policy as the materialized volume build: bf16 MXU
            # passes under the mixed-precision policy, fp32-faithful otherwise.
            precision = (
                jax.lax.Precision.DEFAULT
                if cfg.compute_dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            )
            corr = _ondemand_corr_lookup(
                fmap1, f2_pyramid, coords1, cfg.corr_radius, cfg.corr_impl,
                precision=precision, out_dtype=cfg.compute_dtype,
            )
        elif cfg.corr_impl == "pallas":
            from raft_optical_flow_tpu.kernels.corr_lookup import (
                corr_pyramid_lookup_pallas,
            )

            # windows come out of the kernel already in the compute dtype
            # (fp32-accumulated, single rounding) — no separate convert pass.
            # Serving (test_mode) fuses the coarse levels into one pallas_call
            # (forward-only kernel; their per-level cost is launch overhead,
            # not DMA — BENCH.md open-leads); training keeps the per-level
            # custom-VJP kernels. RAFT_TPU_FUSE_COARSE=0 switches it off.
            import os as _os

            fuse = (
                self.test_mode
                and _os.environ.get("RAFT_TPU_FUSE_COARSE", "1") != "0"
            )
            corr = corr_pyramid_lookup_pallas(
                corr_state, coords1, cfg.corr_radius,
                out_dtype=cfg.compute_dtype, fuse_coarse=fuse,
            )
        else:
            corr = corr_pyramid_lookup(corr_state, coords1, cfg.corr_radius)

        flow = coords1 - coords0
        dtype = cfg.compute_dtype
        if cfg.small:
            block = SmallUpdateBlock(cfg.hidden_dim, name="block")
        else:
            block = BasicUpdateBlock(cfg.hidden_dim, cfg.fused_gru, name="block")
        # the GRU hidden state is carried in the compute dtype (the reference's
        # autocast keeps it half precision too); delta joins fp32 coords
        net, up_mask, delta = block(
            net.astype(dtype), inp.astype(dtype), corr.astype(dtype), flow.astype(dtype)
        )
        delta = delta.astype(jnp.float32)

        coords1 = coords1 + delta

        if self.test_mode:
            # Defer upsampling to after the scan; carry the mask so the caller can
            # upsample the final flow once (carrying avoids stacking masks per-iter).
            if carry_mask:
                return (net, coords1, up_mask), ()
            return (net, coords1), ()

        flow_lo = coords1 - coords0
        if up_mask is None:
            flow_up = upflow8(flow_lo)
        else:
            # checkpoint (config-gated, default OFF): recomputing the
            # upsample's ~262 MB/iter intermediates in the backward measured
            # SLOWER than storing them at crop scale (tools/bench_train_ab.py:
            # 152.6 vs 139.9 ms/step) — kept as a memory lever only.
            upsample = (
                jax.checkpoint(convex_upsample)
                if cfg.checkpoint_upsample
                else convex_upsample
            )
            flow_up = upsample(flow_lo, up_mask.astype(jnp.float32))
        return (net, coords1), flow_up


class RAFT(nn.Module):
    """RAFT flow estimator.

    __call__(image1, image2, iters, flow_init, test_mode, train):
      image1/image2: [N, H, W, 3] in [0, 255] (normalized internally like the
        reference, `core/raft.py:164-165`). H, W divisible by 8.
      Returns: test_mode -> (flow_low [N,H/8,W/8,2], flow_up [N,H,W,2]);
               else -> flow_predictions [iters, N, H, W, 2].
    """

    config: RAFTConfig = RAFTConfig()

    @nn.compact
    def __call__(
        self,
        image1: jax.Array,
        image2: jax.Array,
        iters: int = 12,
        flow_init: Optional[jax.Array] = None,
        test_mode: bool = False,
        train: bool = False,
        freeze_bn: bool = True,
    ):
        cfg = self.config
        N, H, W, _ = image1.shape
        h, w = H // 8, W // 8
        hdim, cdim = cfg.hidden_dim, cfg.context_dim
        dtype = cfg.compute_dtype
        with layers.compute_dtype_scope(dtype):
            return self._forward(
                image1, image2, iters, flow_init, test_mode, train, freeze_bn
            )

    def _forward(self, image1, image2, iters, flow_init, test_mode, train, freeze_bn):
        cfg = self.config
        N, H, W, _ = image1.shape
        h, w = H // 8, W // 8
        hdim, cdim = cfg.hidden_dim, cfg.context_dim
        dtype = cfg.compute_dtype

        image1 = 2.0 * (image1 / 255.0) - 1.0
        image2 = 2.0 * (image2 / 255.0) - 1.0

        if cfg.small:
            fnet = SmallEncoder(128, "instance", cfg.dropout, name="fnet")
            cnet = SmallEncoder(hdim + cdim, "none", cfg.dropout, name="cnet")
        else:
            fnet = BasicEncoder(256, "instance", cfg.dropout, name="fnet")
            cnet = BasicEncoder(hdim + cdim, "batch", cfg.dropout, name="cnet")

        # freeze_bn: BN uses running stats even in training (`core/raft.py:80-87`,
        # applied on every stage except chairs). Dropout still follows `train`.
        bn_train = train and not freeze_bn

        # batch-fold the frame pair through the feature encoder (one conv pass)
        fmaps = fnet(
            jnp.concatenate([image1, image2], axis=0).astype(dtype),
            train=train,
            bn_train=bn_train,
        )
        fmap1, fmap2 = jnp.split(fmaps.astype(jnp.float32), 2, axis=0)

        if cfg.alternate_corr:
            f2_pyr = [fmap2]
            for _ in range(cfg.corr_levels - 1):
                f2_pyr.append(avg_pool2x2(f2_pyr[-1].transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1))
            corr_state = (fmap1, tuple(f2_pyr))
        else:
            # Under the bf16 policy the volume matmul runs at default MXU
            # precision (bf16 inputs, fp32 accumulation) — 6x cheaper than the
            # fp32 HIGHEST passes and within the EPE-parity budget (measured
            # 0.007 px mean delta vs the torch golden); full precision keeps
            # HIGHEST like the reference's fp32 correlation.
            precision = (
                jax.lax.Precision.DEFAULT
                if dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            )
            corr_state = build_corr_pyramid_from_fmaps(
                fmap1, fmap2, cfg.corr_levels, precision=precision
            )
            if dtype == jnp.bfloat16:
                # bf16 volume halves the dominant per-iteration HBM read; the
                # lookup accumulates in fp32 (see kernels/corr_lookup.py)
                corr_state = tuple(c.astype(jnp.bfloat16) for c in corr_state)

        cnet_out = cnet(image1.astype(dtype), train=train, bn_train=bn_train).astype(
            jnp.float32
        )
        net, inp = jnp.split(cnet_out, [hdim], axis=-1)
        net = jnp.tanh(net).astype(dtype)  # GRU state carried in compute dtype
        inp = nn.relu(inp)

        coords0 = coords_grid(N, h, w)
        coords1 = coords0
        if flow_init is not None:
            coords1 = coords1 + flow_init

        iteration_cls = nn.remat(RAFTIteration) if cfg.remat else RAFTIteration
        ScanIter = nn.scan(
            iteration_cls,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=nn.broadcast,
            out_axes=0,
            length=iters,
        )
        carry_mask = test_mode and not cfg.small
        if carry_mask:
            init_carry = (net, coords1, jnp.zeros((N, h, w, 64 * 9), cfg.compute_dtype))
        else:
            init_carry = (net, coords1)
        carry, ys = ScanIter(cfg, test_mode, name="update_block")(
            init_carry, (inp, coords0, corr_state)
        )

        coords1 = carry[1]
        flow_lo = coords1 - coords0
        if test_mode:
            if cfg.small:
                flow_up = upflow8(flow_lo)
            else:
                final_mask = carry[2]
                flow_up = convex_upsample(flow_lo, final_mask.astype(jnp.float32))
            return flow_lo, flow_up
        return ys
