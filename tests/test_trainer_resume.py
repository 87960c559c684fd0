"""End-to-end checkpoint/resume test for the trainer run loops."""

import numpy as np
import jax.numpy as jnp

from raft_optical_flow_tpu.train.trainers import FlowTrainer, OptimConfig


def _batches(n=8, H=64, W=96, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield {
            "image1": jnp.asarray(rng.uniform(0, 255, (n, H, W, 3)), jnp.float32),
            "image2": jnp.asarray(rng.uniform(0, 255, (n, H, W, 3)), jnp.float32),
            "flow": jnp.asarray(rng.uniform(-5, 5, (n, H, W, 2)), jnp.float32),
            "valid": np.ones((n, H, W), np.float32),
        }


def test_flow_trainer_run_resume(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")

    tr = FlowTrainer("simple_flow", image_size=(64, 96),
                     optim=OptimConfig(lr=1e-4, step_size=100),
                     checkpoint_dir=ckpt_dir, seed=7)
    tr.run(_batches(), num_steps=3, val_freq=2)
    assert int(tr.state.step) == 3
    params_after_3 = tr.state.params

    # fresh trainer resumes from the saved full state (step + params + optimizer)
    tr2 = FlowTrainer("simple_flow", image_size=(64, 96),
                      optim=OptimConfig(lr=1e-4, step_size=100),
                      checkpoint_dir=ckpt_dir, seed=7)
    assert int(tr2.state.step) == 0
    tr2.run(_batches(), num_steps=5, val_freq=100, resume=True)
    # resumed at 3, ran steps 3 and 4
    assert int(tr2.state.step) == 5

    # the resumed params started from the saved ones, not a fresh init
    import jax

    leaves3 = jax.tree.leaves(params_after_3)
    fresh = FlowTrainer("simple_flow", image_size=(64, 96),
                        optim=OptimConfig(lr=1e-4, step_size=100),
                        checkpoint_dir=str(tmp_path / "other"), seed=7)
    leaves0 = jax.tree.leaves(fresh.state.params)
    leaves5 = jax.tree.leaves(tr2.state.params)
    # after 2 more steps params differ from both the fresh init and the step-3 save
    diffs_from_fresh = sum(
        float(jnp.abs(a - b).max()) for a, b in zip(leaves5, leaves0)
    )
    diffs_from_3 = sum(
        float(jnp.abs(a - b).max()) for a, b in zip(leaves5, leaves3)
    )
    assert diffs_from_fresh > 0 and diffs_from_3 > 0
    # but much closer to the step-3 state than to a fresh init would imply
    assert diffs_from_3 < diffs_from_fresh
