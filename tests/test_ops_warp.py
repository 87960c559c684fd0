"""Direct torch-oracle parity tests for the warp family and padding ops."""

import numpy as np
import pytest
import jax.numpy as jnp

from raft_optical_flow_tpu.ops.grid import upflow_n
from raft_optical_flow_tpu.ops.padding import InputPadder
from raft_optical_flow_tpu.ops.warp import backward_warp, warp_lfn3

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_grid_sample(img, coords, padding_mode="zeros"):
    """img: [B,H,W,C] np; coords: [B,H,W,2] pixel (x,y). align_corners=True."""
    B, H, W, C = img.shape
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    gx = 2 * coords[..., 0] / (W - 1) - 1
    gy = 2 * coords[..., 1] / (H - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1).astype(np.float32))
    out = F.grid_sample(t, grid, mode="bilinear", padding_mode=padding_mode,
                        align_corners=True)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_backward_warp_matches_grid_sample(padding):
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 12, 18, 4
    img = rng.randn(B, H, W, C).astype(np.float32)
    flow = rng.uniform(-4, 4, (B, H, W, 2)).astype(np.float32)
    gy, gx = np.mgrid[0:H, 0:W]
    coords = np.stack([gx, gy], -1)[None] + flow

    ours = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow),
                                    padding=padding))
    ref = _torch_grid_sample(img, coords, padding_mode=padding)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_warp_lfn3_matches_irr_warping_layer():
    """Oracle re-derived from `liteflownet3_warp.py:66-111`: grid_sample + the
    >=1.0 mask of a sampled all-ones image."""
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 10, 14, 3
    img = rng.randn(B, H, W, C).astype(np.float32)
    flow = rng.uniform(-6, 6, (B, H, W, 2)).astype(np.float32)
    div = 2.5

    gy, gx = np.mgrid[0:H, 0:W]
    coords = np.stack([gx, gy], -1)[None] + flow / div
    warped = _torch_grid_sample(img, coords)
    ones = _torch_grid_sample(np.ones_like(img), coords)
    ref = warped * (ones >= 1.0)

    ours = np.asarray(warp_lfn3(jnp.asarray(img), jnp.asarray(flow), div))

    # the reference thresholds a float weight-sum at exactly 1.0, which flips on
    # 1-ulp rounding; exclude those marginal pixels and require the rest to match
    marginal = (ones != 1.0) & (np.abs(ones - 1.0) < 1e-5)
    comparable = ~marginal
    np.testing.assert_allclose(ours[comparable], ref[comparable],
                               rtol=1e-5, atol=1e-5)
    # marginal pixels must be a thin set, not systematic disagreement
    assert marginal.mean() < 0.05


def test_input_padder_matches_torch_pad():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 30, 45, 3).astype(np.float32)
    for mode in ("sintel", "kitti"):
        p = InputPadder(x.shape, mode=mode)
        ours = np.asarray(p.pad(jnp.asarray(x)))
        l, r, t, b = p._pad
        ref = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (l, r, t, b),
                    mode="replicate").permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, ref)
        assert ours.shape[1] % 8 == 0 and ours.shape[2] % 8 == 0
        np.testing.assert_array_equal(np.asarray(p.unpad(jnp.asarray(ours))), x)


def test_upflow_n_values_scale():
    flow = jnp.ones((1, 4, 6, 2))
    up = upflow_n(flow, 4)
    assert up.shape == (1, 16, 24, 2)
    np.testing.assert_allclose(np.asarray(up), 4.0, rtol=1e-6)
