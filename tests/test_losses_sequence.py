"""Direct tests for the supervised sequence losses.

Mirrors the reference's `test_sequence_loss.py:19-64` pattern (positive loss,
finite gradients on every input) and adds a torch-free analytic oracle for the
RAFT loss's exact semantics (`train.py:47-106`).
"""

import numpy as np
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.losses.sequence import multiscale_sequence_loss, sequence_loss


def _inputs(T=3, N=2, H=8, W=12, seed=0):
    rng = np.random.RandomState(seed)
    preds = jnp.asarray(rng.randn(T, N, H, W, 2).astype(np.float32))
    gt = jnp.asarray(rng.randn(N, H, W, 2).astype(np.float32))
    valid = jnp.asarray((rng.rand(N, H, W) > 0.3).astype(np.float32))
    return preds, gt, valid


def test_sequence_loss_matches_reference_semantics():
    """gamma-weighted L1, invalids zeroed, mean over ALL elements (`train.py:90`)."""
    preds, gt, valid = _inputs()
    gamma = 0.8
    loss, metrics = sequence_loss(preds, gt, valid, gamma=gamma)

    p = np.asarray(preds)
    g = np.asarray(gt)
    mag = np.sqrt((g**2).sum(-1))
    v = ((np.asarray(valid) >= 0.5) & (mag < 400)).astype(np.float32)
    T = p.shape[0]
    expected = 0.0
    for i in range(T):
        w = gamma ** (T - i - 1)
        expected += w * (v[..., None] * np.abs(p[i] - g)).mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)

    epe = np.sqrt(((p[-1] - g) ** 2).sum(-1))
    np.testing.assert_allclose(
        float(metrics["epe"]), (epe * v).sum() / v.sum(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["1px"]), ((epe < 1) * v).sum() / v.sum(), rtol=1e-5
    )


def test_sequence_loss_excludes_large_flow():
    preds, gt, valid = _inputs()
    gt_big = gt.at[:, :4].set(500.0)  # |gt| > MAX_FLOW excluded
    loss_big, m_big = sequence_loss(preds, gt_big, valid)
    # the excluded region contributes zero; loss stays finite and positive
    assert np.isfinite(float(loss_big)) and float(loss_big) > 0


def test_sequence_loss_grads_finite_every_step():
    """Reference pattern: backward yields non-NaN grads on every prediction."""
    preds, gt, valid = _inputs()

    grads = jax.grad(lambda p: sequence_loss(p, gt, valid)[0])(preds)
    g = np.asarray(grads)
    assert np.isfinite(g).all()
    for t in range(g.shape[0]):
        assert np.abs(g[t]).max() > 0, f"no gradient reached prediction {t}"


def test_multiscale_loss_list_and_grads():
    rng = np.random.RandomState(1)
    H, W = 32, 48
    gt = jnp.asarray(rng.randn(1, H, W, 2).astype(np.float32))
    valid = jnp.ones((1, H, W), jnp.float32)
    preds = [
        jnp.asarray(rng.randn(1, H // s, W // s, 2).astype(np.float32))
        for s in (1, 4, 8, 16, 32)
    ]
    loss = multiscale_sequence_loss(preds, gt, valid)
    assert float(loss) > 0

    grads = jax.grad(
        lambda ps: multiscale_sequence_loss(ps, gt, valid)
    )(preds)
    assert all(np.isfinite(np.asarray(x)).all() for x in grads)
    assert all(float(jnp.abs(x).max()) > 0 for x in grads)
