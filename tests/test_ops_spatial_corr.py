"""Parity tests for the shift-window spatial correlation sampler.

Torch oracle re-derived inline from the documented semantics of
`liteflownet3_correlation.py:35-131` (zero-padded shift-and-multiply, y-major
channel order).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from raft_optical_flow_tpu.ops.spatial_corr import (
    spatial_correlation_sample,
    translated_spatial_correlation_sample,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_oracle(in1, in2, patch, dil):
    """in1/in2: [B, C, H, W] torch. -> [B, patch^2, H, W]."""
    b, c, h, w = in1.shape
    half_lo = dil * ((patch - 1) // 2)
    half_hi = dil * (patch // 2)
    in2p = F.pad(in2, (half_lo, half_hi, half_lo, half_hi))
    out = torch.zeros(b, patch, patch, h, w)
    for i in range(0, patch * dil, dil):
        for j in range(0, patch * dil, dil):
            out[:, i // dil, j // dil] = (in1 * in2p[:, :, i : i + h, j : j + w]).sum(1)
    return out.view(b, patch * patch, h, w)


@pytest.mark.parametrize("patch,dil", [(9, 1), (5, 2), (7, 2), (9, 2)])
def test_spatial_corr_matches_oracle(patch, dil):
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 10, 14, 8
    a = rng.randn(B, H, W, C).astype(np.float32)
    b = rng.randn(B, H, W, C).astype(np.float32)

    ours = np.asarray(spatial_correlation_sample(jnp.asarray(a), jnp.asarray(b), patch, dil))
    ref = _torch_oracle(
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
        patch,
        dil,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_translated_corr_zero_flow_matches_static():
    """With zero flow, the translated sampler equals the static one."""
    rng = np.random.RandomState(1)
    B, H, W, C = 1, 8, 12, 4
    a = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    b = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    flow = jnp.zeros((B, H, W, 2), jnp.float32)
    t = np.asarray(translated_spatial_correlation_sample(a, b, flow, 5, 1))
    s = np.asarray(spatial_correlation_sample(a, b, 5, 1))
    np.testing.assert_allclose(t, s, rtol=1e-5, atol=1e-5)
