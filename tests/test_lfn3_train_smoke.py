"""LFN3 one-step training smoke test on random tensors.

Mirrors the reference's `test_training_flow.py:13-93`: forward in training mode,
multi-scale loss, backward, finite-grad check, optimizer step, then an eval-mode
shape check — no dataset required.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from raft_optical_flow_tpu.losses.sequence import multiscale_sequence_loss
from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3


def test_lfn3s_one_train_step():
    rng = np.random.RandomState(0)
    B, H, W = 2, 64, 96
    images = jnp.asarray(rng.uniform(0, 1, (B, 2, H, W, 3)), jnp.float32)
    flow_gt = jnp.asarray(rng.uniform(-5, 5, (B, H, W, 2)), jnp.float32)
    valid = jnp.ones((B, H, W), jnp.float32)

    model = LiteFlowNet3(LFN3Config(use_s_version=True))
    variables = model.init(jax.random.PRNGKey(0), images, training=True)

    def loss_fn(params):
        out = model.apply({"params": params}, images, training=True)
        # reference training loss convention (`train_liteflownet3.py:206-252`):
        # finest-first [final full-res, 1/4 * div_flow, ..., 1/32 * div_flow].
        cfg = model.config
        preds = [out["flows"][:, 0]] + [
            p * cfg.div_flow for p in reversed(out["flow_preds"])
        ]
        return multiscale_sequence_loss(preds, flow_gt, valid)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0

    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    tx = optax.adam(1e-4)
    opt_state = tx.init(variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)

    out = model.apply({"params": new_params}, images)
    assert out["flows"].shape == (B, 1, H, W, 2)
    assert np.isfinite(np.asarray(out["flows"])).all()
