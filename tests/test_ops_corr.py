"""Parity tests for the all-pairs correlation volume, pyramid, and windowed lookup.

The torch reference computation (core/corr.py CorrBlock) is re-derived inline here from
its documented semantics to serve as the golden oracle.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from raft_optical_flow_tpu.ops import (
    all_pairs_correlation,
    avg_pool2x2,
    build_corr_pyramid,
    corr_pyramid_lookup,
)
from raft_optical_flow_tpu.ops.upsample import convex_upsample

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_corr_block(fmap1, fmap2, num_levels, radius, coords_xy):
    """Oracle reproducing CorrBlock semantics (core/corr.py:25-94) in torch."""
    batch, dim, ht, wd = fmap1.shape
    f1 = fmap1.view(batch, dim, ht * wd)
    f2 = fmap2.view(batch, dim, ht * wd)
    corr = torch.matmul(f1.transpose(1, 2), f2) / torch.sqrt(torch.tensor(float(dim)))
    corr = corr.view(batch * ht * wd, 1, ht, wd)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    r = radius
    coords = coords_xy  # [N, H, W, 2]
    out_pyramid = []
    for i in range(num_levels):
        corr_i = pyramid[i]
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(batch * ht * wd, 1, 1, 2) / 2**i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        # bilinear_sampler: pixel coords -> normalized, align_corners=True, zeros pad
        H, W = corr_i.shape[-2:]
        xg = 2 * coords_lvl[..., 0:1] / (W - 1) - 1
        yg = 2 * coords_lvl[..., 1:2] / (H - 1) - 1
        grid = torch.cat([xg, yg], dim=-1)
        samp = F.grid_sample(corr_i, grid, align_corners=True)
        out_pyramid.append(samp.view(batch, ht, wd, -1))
    out = torch.cat(out_pyramid, dim=-1)
    return out  # [N, H, W, L*(2r+1)^2]


def test_avg_pool2x2_odd_sizes():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, 9).astype(np.float32)
    ours = np.asarray(avg_pool2x2(jnp.asarray(x)))
    ref = F.avg_pool2d(torch.from_numpy(x)[:, None], 2, stride=2)[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("radius", [3, 4])
def test_corr_lookup_matches_reference(radius):
    rng = np.random.RandomState(42)
    # H, W large enough that level-3 maps stay >= 2x2 (degenerate 1x1 maps make the
    # torch oracle divide by zero in its coordinate normalization).
    B, H, W, C = 2, 16, 24, 16
    fmap1 = rng.randn(B, H, W, C).astype(np.float32)
    fmap2 = rng.randn(B, H, W, C).astype(np.float32)
    # coords as they appear mid-iteration: grid + noise flow
    gy, gx = np.mgrid[0:H, 0:W]
    coords = np.stack([gx, gy], axis=-1)[None].repeat(B, 0).astype(np.float32)
    coords = coords + rng.uniform(-3, 3, coords.shape).astype(np.float32)

    corr = all_pairs_correlation(jnp.asarray(fmap1), jnp.asarray(fmap2))
    pyr = build_corr_pyramid(corr, num_levels=4)
    ours = np.asarray(corr_pyramid_lookup(pyr, jnp.asarray(coords), radius))

    t1 = torch.from_numpy(fmap1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(fmap2).permute(0, 3, 1, 2)
    ref = _torch_corr_block(t1, t2, 4, radius, torch.from_numpy(coords)).numpy()

    assert ours.shape == ref.shape == (B, H, W, 4 * (2 * radius + 1) ** 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pyramid_from_fmaps_matches_pooled_volume():
    """dot-then-pool == pool-then-dot (linearity), to float tolerance."""
    from raft_optical_flow_tpu.ops.corr import build_corr_pyramid_from_fmaps

    rng = np.random.RandomState(3)
    B, H, W, C = 2, 14, 18, 16
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ref = build_corr_pyramid(all_pairs_correlation(f1, f2), 4)
    ours = build_corr_pyramid_from_fmaps(f1, f2, 4)
    assert len(ours) == len(ref)
    for a, b in zip(ours, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_convex_upsample_matches_reference():
    """Oracle: core/raft.py:112-142 upsample_flow."""
    rng = np.random.RandomState(7)
    N, h, w = 2, 5, 6
    flow = rng.randn(N, h, w, 2).astype(np.float32)
    mask = rng.randn(N, h, w, 576).astype(np.float32)

    ours = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))

    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    t_mask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    m = t_mask.view(N, 1, 9, 8, 8, h, w)
    m = torch.softmax(m, dim=2)
    up = F.unfold(8 * t_flow, [3, 3], padding=1)
    up = up.view(N, 2, 9, 1, 1, h, w)
    up = torch.sum(m * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    ref = up.reshape(N, 2, 8 * h, 8 * w).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
