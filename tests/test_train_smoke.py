"""Single-step training smoke tests on synthetic tensors (reference pattern:
test_training_flow.py — forward, loss, backward, grad check, optimizer step), plus
the SPMD data-parallel path on the virtual 8-device CPU mesh (a capability the
reference never had — SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.models import RAFTConfig
from raft_optical_flow_tpu.train.configs import StageConfig
from raft_optical_flow_tpu.train.trainer import (
    create_train_state,
    raft_train_step,
)
from raft_optical_flow_tpu.parallel.mesh import make_mesh, shard_batch


def _synthetic_batch(rng, n, h, w):
    return {
        "image1": jnp.asarray(rng.uniform(0, 255, (n, h, w, 3)), jnp.float32),
        "image2": jnp.asarray(rng.uniform(0, 255, (n, h, w, 3)), jnp.float32),
        "flow": jnp.asarray(rng.uniform(-5, 5, (n, h, w, 2)), jnp.float32),
        "valid": jnp.ones((n, h, w), jnp.float32),
    }


def _stage(**kw):
    base = dict(
        name="t", stage="chairs", num_steps=10, batch_size=2, lr=1e-4,
        image_size=(64, 96), small=True,
    )
    base.update(kw)
    return StageConfig(**base)


def test_raft_small_train_step():
    cfg = RAFTConfig(small=True)
    stage = _stage()
    state = create_train_state(jax.random.PRNGKey(0), cfg, stage, stage.image_size)
    batch = _synthetic_batch(np.random.RandomState(0), 2, 64, 96)

    p0 = jax.tree.map(lambda x: np.asarray(x), state.params)
    state, metrics = raft_train_step(
        state, batch, jax.random.PRNGKey(1), config=cfg, iters=3, gamma=0.8,
        freeze_bn=False,
    )
    assert np.isfinite(float(metrics["loss"])) and float(metrics["loss"]) > 0
    assert np.isfinite(float(metrics["grad_norm"])) and float(metrics["grad_norm"]) > 0
    assert np.isfinite(float(metrics["epe"]))
    # every parameter moved
    moved = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()), p0, state.params)
    total_moved = sum(jax.tree.leaves(moved))
    assert total_moved > 0


def test_raft_standard_train_step_updates_bn():
    """Standard model trains cnet BatchNorm stats when freeze_bn=False (chairs stage)."""
    cfg = RAFTConfig(small=False)
    stage = _stage(small=False, image_size=(64, 64), batch_size=1)
    state = create_train_state(jax.random.PRNGKey(0), cfg, stage, stage.image_size)
    assert state.batch_stats, "standard model must carry BN running stats"
    bs0 = jax.tree.map(np.asarray, state.batch_stats)
    batch = _synthetic_batch(np.random.RandomState(1), 1, 64, 64)
    state, metrics = raft_train_step(
        state, batch, jax.random.PRNGKey(1), config=cfg, iters=2, freeze_bn=False
    )
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()), bs0, state.batch_stats)
    assert sum(jax.tree.leaves(diffs)) > 0, "BN stats should update when not frozen"

    # frozen: stats must NOT change
    bs1 = jax.tree.map(np.asarray, state.batch_stats)
    state, _ = raft_train_step(
        state, batch, jax.random.PRNGKey(2), config=cfg, iters=2, freeze_bn=True
    )
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()), bs1, state.batch_stats)
    assert sum(jax.tree.leaves(diffs)) == 0


def test_data_parallel_train_step_matches_single_device():
    """DP over the 8-device CPU mesh must produce the same update as single-device."""
    cfg = RAFTConfig(small=True)
    stage = _stage(batch_size=8)
    batch = _synthetic_batch(np.random.RandomState(2), 8, 64, 96)

    def run(mesh):
        state = create_train_state(jax.random.PRNGKey(0), cfg, stage, stage.image_size)
        b = shard_batch(batch, mesh) if mesh is not None else batch
        step = jax.jit(
            lambda s, bb: raft_train_step(
                s, bb, jax.random.PRNGKey(1), config=cfg, iters=2, freeze_bn=True
            )
        )
        state, metrics = step(state, b)
        return jax.tree.map(np.asarray, state.params), float(metrics["loss"])

    mesh = make_mesh()
    assert mesh.devices.size == 8
    p_dp, loss_dp = run(mesh)
    p_sd, loss_sd = run(None)
    assert abs(loss_dp - loss_sd) < 1e-4
    err = max(jax.tree.leaves(jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p_dp, p_sd)))
    assert err < 1e-4, f"DP and single-device params diverged: {err}"


def test_remat_iteration_matches_baseline_grads():
    """cfg.remat recomputes the GRU iterations in backward; loss and gradients
    match up to fusion-order float noise (remat moves fusion boundaries, so
    even the forward can differ in the last ulp)."""
    from raft_optical_flow_tpu.models.raft import RAFT

    rng = np.random.RandomState(5)
    img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (1, 32, 48, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(-2, 2, (1, 32, 48, 2)), jnp.float32)

    def grads_for(remat):
        model = RAFT(RAFTConfig(small=True, remat=remat))
        variables = model.init(jax.random.PRNGKey(0), img1, img2, iters=1,
                               test_mode=True)

        def loss_fn(p):
            preds = model.apply({"params": p}, img1, img2, iters=3, train=True,
                                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(jnp.abs(preds - gt[None]))

        return jax.value_and_grad(loss_fn)(variables["params"])

    (l0, g0), (l1, g1) = grads_for(False), grads_for(True)
    assert abs(float(l0) - float(l1)) < 1e-6 * max(abs(float(l0)), 1.0)
    scale = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g0))))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * scale
