"""One-step train smoke tests for every (model, supervision) trainer combination.

The reference's integration-test pattern (`test_training_flow.py`): random-tensor
batch -> forward -> loss -> backward -> step -> finite metrics. Run on the virtual
8-device CPU mesh so SPMD sharding is exercised too.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from raft_optical_flow_tpu.losses.unsupervised import unsupervised_loss
from raft_optical_flow_tpu.train.trainers import FlowTrainer, OptimConfig


def _batch(rng, H=64, W=96, N=8):  # N divisible by the 8-device test mesh
    return {
        "image1": jnp.asarray(rng.uniform(0, 255, (N, H, W, 3)), jnp.float32),
        "image2": jnp.asarray(rng.uniform(0, 255, (N, H, W, 3)), jnp.float32),
        "flow": jnp.asarray(rng.uniform(-5, 5, (N, H, W, 2)), jnp.float32),
        "valid": jnp.ones((N, H, W), jnp.float32),
    }


@pytest.mark.parametrize(
    "kind",
    ["lfn3", "lfn3_unsup", "simple_flow", "simple_flow_unsup", "ifnet", "ifnet_unsup"],
)
def test_one_train_step(kind):
    rng = np.random.RandomState(0)
    trainer = FlowTrainer(kind, image_size=(64, 96),
                          optim=OptimConfig(lr=1e-4, step_size=100))
    metrics = trainer.train_step(_batch(rng))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{kind}: {k} not finite"
    assert float(metrics["grad_norm"]) > 0
    assert float(metrics["loss"]) > 0


def test_uflow_selfsup_train_step():
    """UFlow census+smooth+selfsup trainer (raft_uflow_unsup): the selfsup term
    must be live (finite, gradients flowing through the student pass)."""
    rng = np.random.RandomState(2)
    trainer = FlowTrainer("raft_uflow_unsup", image_size=(48, 64),
                          optim=OptimConfig(lr=1e-4, step_size=100))
    metrics = trainer.train_step(_batch(rng, H=48, W=64))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["grad_norm"]) > 0
    assert "selfsup" in metrics and "census" in metrics and "smooth2" in metrics
    assert float(metrics["epe"]) > 0  # gt flow in batch -> monitoring EPE


def test_warped_pair_batches_exact_flow():
    """Synthetic warped pairs: image1 resampled by the stored flow must match
    image2 where valid (the gt flow is exact by construction)."""
    from raft_optical_flow_tpu.data.synthetic import warped_pair_batches
    from raft_optical_flow_tpu.ops.grid import bilinear_sampler
    from raft_optical_flow_tpu.ops.grid import coords_grid

    batch = next(warped_pair_batches(2, crop=(32, 48), max_flow=4.0, seed=3))
    img1 = jnp.asarray(batch["image1"])
    img2 = jnp.asarray(batch["image2"])
    flow = jnp.asarray(batch["flow"])
    coords = coords_grid(2, 32, 48) + flow
    resampled = bilinear_sampler(img2, coords[:, :, :, None], padding="border")[
        :, :, :, 0
    ]
    err = np.abs(np.asarray(resampled) - np.asarray(img1))
    # bilinear-of-bilinear blur: small mean error, bounded max
    assert err.mean() < 3.0 and np.median(err) < 1.0


def test_unsupervised_loss_values():
    rng = np.random.RandomState(1)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (1, 32, 48, 3)), jnp.float32)
    preds_fw = [jnp.asarray(rng.uniform(-2, 2, (1, 32 // s, 48 // s, 2)), jnp.float32)
                for s in (8, 4, 2)]
    preds_bw = [jnp.asarray(rng.uniform(-2, 2, (1, 32 // s, 48 // s, 2)), jnp.float32)
                for s in (8, 4, 2)]
    total, d = unsupervised_loss(img1, img2, preds_fw, preds_bw)
    assert float(total) > 0
    # forward-only drops the consistency term
    total_fw, d_fw = unsupervised_loss(img1, img2, preds_fw, None)
    assert float(d_fw["consistency"]) == 0.0
