"""Parity tests for ops/grid.py against torch grid_sample / interpolate semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from raft_optical_flow_tpu.ops import (
    bilinear_sampler,
    coords_grid,
    resize_bilinear_align_corners,
    upflow8,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_grid_sample_pixel(img_nchw, coords_xy, padding_mode="zeros"):
    """Reference: core/utils/utils.py:57-71 bilinear_sampler semantics."""
    H, W = img_nchw.shape[-2:]
    xgrid = 2 * coords_xy[..., 0:1] / (W - 1) - 1
    ygrid = 2 * coords_xy[..., 1:2] / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img_nchw, grid, align_corners=True, padding_mode=padding_mode)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_bilinear_sampler_matches_torch(padding):
    rng = np.random.RandomState(0)
    N, H, W, C = 2, 13, 17, 3
    img = rng.randn(N, H, W, C).astype(np.float32)
    # coords covering in-bounds, fractional, and far out-of-bounds points
    coords = rng.uniform(-4.0, max(H, W) + 3.0, size=(N, 9, 11, 2)).astype(np.float32)

    ours = np.asarray(bilinear_sampler(jnp.asarray(img), jnp.asarray(coords), padding=padding))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_coords = torch.from_numpy(coords)
    theirs = _torch_grid_sample_pixel(t_img, t_coords, padding_mode=padding)
    theirs = theirs.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_bilinear_sampler_mask():
    img = jnp.ones((1, 8, 8, 1))
    coords = jnp.array([[[[0.0, 0.0], [3.5, 3.5], [7.0, 7.0], [-1.0, 2.0]]]])
    _, mask = bilinear_sampler(img, coords, return_mask=True)
    # open-interval mask per core/utils/utils.py:67-69
    np.testing.assert_array_equal(np.asarray(mask)[0, 0], [0.0, 1.0, 0.0, 0.0])


def test_coords_grid():
    g = np.asarray(coords_grid(2, 3, 4))
    assert g.shape == (2, 3, 4, 2)
    assert g[0, 1, 2, 0] == 2.0  # x
    assert g[0, 1, 2, 1] == 1.0  # y


def test_resize_align_corners_matches_torch():
    rng = np.random.RandomState(1)
    img = rng.randn(2, 7, 9, 3).astype(np.float32)
    out = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), (20, 33)))
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.interpolate(t, size=(20, 33), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)


def test_upflow8_matches_torch():
    rng = np.random.RandomState(2)
    flow = rng.randn(1, 6, 5, 2).astype(np.float32)
    out = np.asarray(upflow8(jnp.asarray(flow)))
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ref = 8 * F.interpolate(t, size=(48, 40), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-4)
