"""Pallas kernel parity tests (interpret mode on the CPU mesh).

Oracles are the XLA reference implementations in ops/corr.py and the sampling
formulation in kernels/corr_ondemand.py, which themselves have torch-parity tests.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.kernels.corr_lookup import corr_pyramid_lookup_pallas
from raft_optical_flow_tpu.kernels.corr_ondemand import (
    _ondemand_xla,
    ondemand_corr_pyramid,
)
from raft_optical_flow_tpu.ops.corr import (
    all_pairs_correlation,
    avg_pool2x2,
    build_corr_pyramid,
    corr_pyramid_lookup,
)


def _make_inputs(seed=0, B=2, H=12, W=16, C=32, max_disp=4.0):
    rng = np.random.RandomState(seed)
    fmap1 = rng.randn(B, H, W, C).astype(np.float32)
    fmap2 = rng.randn(B, H, W, C).astype(np.float32)
    gy, gx = np.mgrid[0:H, 0:W]
    coords = np.stack([gx, gy], axis=-1)[None].repeat(B, 0).astype(np.float32)
    coords = coords + rng.uniform(-max_disp, max_disp, coords.shape).astype(np.float32)
    return jnp.asarray(fmap1), jnp.asarray(fmap2), jnp.asarray(coords)


def _f2_pyramid(fmap2, levels):
    pyr = [fmap2]
    for _ in range(levels - 1):
        pyr.append(avg_pool2x2(pyr[-1].transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1))
    return tuple(pyr)


@pytest.mark.parametrize("radius", [3, 4])
def test_pallas_lookup_matches_xla(radius):
    fmap1, fmap2, coords = _make_inputs(seed=1)
    pyr = build_corr_pyramid(all_pairs_correlation(fmap1, fmap2), 4)
    ref = np.asarray(corr_pyramid_lookup(pyr, coords, radius))
    ours = np.asarray(corr_pyramid_lookup_pallas(pyr, coords, radius, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pallas_lookup_far_out_of_bounds():
    """Windows fully outside the volume must be exactly zero (grid_sample zeros)."""
    fmap1, fmap2, coords = _make_inputs(seed=2)
    coords = coords + 100.0  # far outside every level
    pyr = build_corr_pyramid(all_pairs_correlation(fmap1, fmap2), 4)
    ref = np.asarray(corr_pyramid_lookup(pyr, coords, 4))
    ours = np.asarray(corr_pyramid_lookup_pallas(pyr, coords, 4, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    assert np.all(ours == 0.0)


@pytest.mark.parametrize("radius", [3, 4])
def test_pallas_lookup_fuse_coarse_matches_xla(radius):
    """Serving path: levels 1..L-1 fused into one pallas_call must match the
    per-level XLA reference exactly (same selector math, placement offsets)."""
    fmap1, fmap2, coords = _make_inputs(seed=7)
    pyr = build_corr_pyramid(all_pairs_correlation(fmap1, fmap2), 4)
    ref = np.asarray(corr_pyramid_lookup(pyr, coords, radius))
    ours = np.asarray(
        corr_pyramid_lookup_pallas(
            pyr, coords, radius, interpret=True, fuse_coarse=True
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_pallas_lookup_fuse_coarse_empty_level():
    """Tiny crops empty the deepest level(s); the fused path must fuse the
    non-empty prefix and zero-fill the rest, matching the XLA reference."""
    fmap1, fmap2, coords = _make_inputs(seed=8, H=6, W=8)
    pyr = build_corr_pyramid(all_pairs_correlation(fmap1, fmap2), 4)
    assert pyr[-1].shape[2] == 0  # the case under test
    ref = np.asarray(corr_pyramid_lookup(pyr, coords, 3))
    ours = np.asarray(
        corr_pyramid_lookup_pallas(pyr, coords, 3, interpret=True, fuse_coarse=True)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("radius", [3, 4])
def test_ondemand_matches_xla_sampling(radius):
    fmap1, fmap2, coords = _make_inputs(seed=3)
    pyr = _f2_pyramid(fmap2, 4)
    ref = np.asarray(_ondemand_xla(fmap1, pyr, coords, radius))
    ours = np.asarray(ondemand_corr_pyramid(fmap1, pyr, coords, radius, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ondemand_matches_materialized_pyramid():
    """On-demand correlation == windowed lookup over the materialized volume."""
    fmap1, fmap2, coords = _make_inputs(seed=4)
    radius = 4
    corr_pyr = build_corr_pyramid(all_pairs_correlation(fmap1, fmap2), 4)
    ref = np.asarray(corr_pyramid_lookup(corr_pyr, coords, radius))
    f2_pyr = _f2_pyramid(fmap2, 4)
    ours = np.asarray(
        ondemand_corr_pyramid(fmap1, f2_pyr, coords, radius, interpret=True)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_lookup_custom_vjp_matches_xla_grads():
    """Pallas lookup backward (d wrt the volume) vs XLA gather-path autodiff."""
    fmap1, fmap2, coords = _make_inputs(seed=6, B=1, H=10, W=12, C=16)
    pyr = build_corr_pyramid(all_pairs_correlation(fmap1, fmap2), 3)

    def loss_pallas(pyr):
        out = corr_pyramid_lookup_pallas(pyr, coords, 3, interpret=True)
        return jnp.sum(jnp.cos(out))

    def loss_xla(pyr):
        out = corr_pyramid_lookup(pyr, coords, 3)
        return jnp.sum(jnp.cos(out))

    g1 = jax.grad(loss_pallas)(pyr)
    g2 = jax.grad(loss_xla)(pyr)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_full_model_trains_through_ondemand_path():
    """alternate_corr=True end-to-end gradient step (custom VJP in the scan)."""
    from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-2, 2, (1, 32, 48, 2)), jnp.float32)

    model = RAFT(RAFTConfig(small=True, alternate_corr=True))
    variables = model.init(jax.random.PRNGKey(0), img1, img2, iters=1,
                           test_mode=True)

    def loss_fn(params):
        preds = model.apply({"params": params}, img1, img2, iters=2, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.mean(jnp.abs(preds - gt[None]))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradient reaches the feature encoder (through the on-demand corr VJP)
    fnet_grads = jax.tree.leaves(grads["fnet"])
    assert any(float(jnp.abs(g).max()) > 0 for g in fnet_grads)


def test_ondemand_streaming_path_matches_oracle(monkeypatch):
    """h-chunk streaming kernels (big-frame path) == resident path == oracle.

    Tiny VMEM budgets force every level onto the streaming kernels (CH=1, one
    fmap2 row per grid step, partial-sum outputs)."""
    from raft_optical_flow_tpu.kernels import corr_ondemand_pallas as kp

    monkeypatch.setattr(kp, "_RESIDENT_BUDGET", 1024)
    monkeypatch.setattr(kp, "_CHUNK_BUDGET", 1024)
    fmap1, fmap2, coords = _make_inputs(seed=7, B=1, H=10, W=12, C=16)
    pyr = _f2_pyramid(fmap2, 3)
    assert kp._level_geometry(pyr[0])[4] > 1  # actually streaming

    ref = np.asarray(_ondemand_xla(fmap1, pyr, coords, 3))
    ours = np.asarray(
        kp.ondemand_corr_pyramid_pallas(fmap1, pyr, coords, 3, interpret=True)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def loss_pallas(f1, f2s):
        out = kp.ondemand_corr_pyramid_pallas(f1, f2s, coords, 3, interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(f1, f2s):
        return jnp.sum(jnp.sin(_ondemand_xla(f1, f2s, coords, 3)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(fmap1, pyr)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(fmap1, pyr)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_ondemand_custom_vjp_matches_xla_grads():
    fmap1, fmap2, coords = _make_inputs(seed=5, B=1, H=8, W=10, C=16)
    pyr = _f2_pyramid(fmap2, 2)

    def loss_pallas(f1, f2s):
        out = ondemand_corr_pyramid(f1, f2s, coords, 3, interpret=True)
        return jnp.sum(jnp.sin(out))

    def loss_xla(f1, f2s):
        out = _ondemand_xla(f1, f2s, coords, 3)
        return jnp.sum(jnp.sin(out))

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(fmap1, pyr)
    g2 = jax.grad(loss_xla, argnums=(0, 1))(fmap1, pyr)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("W", [16, 37])
def test_fused_sepconv_gru_matches_reference(W):
    """kernels/gru_fused.py: fused Pallas SepConvGRU (interpret) == XLA reference
    (`core/update.py:74-121` semantics), forward and custom-VJP gradients.

    W=37 (prime) exercises the vertical pass's ceil-div grid with a masked
    partial final block — the round-3 ADVICE fix replacing the
    largest-divisor fallback that degenerated to 1-wide blocks."""
    from raft_optical_flow_tpu.kernels.gru_fused import (
        sepconv_gru_pallas,
        sepconv_gru_reference,
    )

    rng = np.random.RandomState(3)
    B, H, D, X = 1, 8, 16, 24
    h = jnp.asarray(rng.randn(B, H, W, D), jnp.float32)
    x = jnp.asarray(rng.randn(B, H, W, X), jnp.float32)
    params = {}
    for s, ks in (("1", (1, 5)), ("2", (5, 1))):
        for g in "zrq":
            params[f"conv{g}{s}"] = (
                jnp.asarray(rng.randn(*ks, D + X, D) * 0.05, jnp.float32),
                jnp.asarray(rng.randn(D) * 0.05, jnp.float32),
            )

    ref = sepconv_gru_reference(h, x, params)
    out = sepconv_gru_pallas(h, x, params, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_p(h, x, p):
        return jnp.sum(jnp.sin(sepconv_gru_pallas(h, x, p, True)))

    def loss_r(h, x, p):
        return jnp.sum(jnp.sin(sepconv_gru_reference(h, x, p)))

    g1 = jax.grad(loss_p, argnums=(0, 1, 2))(h, x, params)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(h, x, params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_lookup_pallas_empty_pyramid_level():
    """Floor-mode pooling can empty a level (h: 6 -> 3 -> 1 -> 0); the Pallas
    wrapper must match the XLA path's all-out-of-bounds zeros there instead of
    asking Mosaic for a zero-sized block (selfsup student crops hit this)."""
    from raft_optical_flow_tpu.ops.corr import (
        build_corr_pyramid_from_fmaps,
        corr_pyramid_lookup,
    )

    rng = np.random.RandomState(7)
    B, h, w, C, r = 1, 6, 12, 16, 3
    f1 = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
    f2 = jnp.asarray(rng.randn(B, h, w, C), jnp.float32)
    pyr = build_corr_pyramid_from_fmaps(f1, f2, 4)
    assert pyr[-1].shape[2] == 0  # the empty level under test
    coords = jnp.asarray(rng.uniform(0, [w - 1, h - 1], (B, h, w, 2)), jnp.float32)

    ref = corr_pyramid_lookup(pyr, coords, r)
    out = corr_pyramid_lookup_pallas(pyr, coords, r, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    K = 2 * r + 1
    assert np.all(np.asarray(out)[..., 3 * K * K :] == 0.0)
