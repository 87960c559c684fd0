"""Tests for checkpointing (orbax), export (StableHLO), logging, and viz utils."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from raft_optical_flow_tpu.train.trainer import TrainState
from raft_optical_flow_tpu.utils.checkpoint import (
    CheckpointManager,
    restore_train_state,
    save_train_state,
)
from raft_optical_flow_tpu.utils.export import export_stablehlo, load_stablehlo
from raft_optical_flow_tpu.utils.flow_viz import flow_to_image


def _make_state(value=1.0):
    params = {"w": jnp.full((4, 4), value), "b": jnp.zeros((4,))}
    tx = optax.adam(1e-3)
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={"m": jnp.ones((4,))},
        opt_state=tx.init(params),
        tx=tx,
    )


def test_orbax_roundtrip(tmp_path):
    state = _make_state(3.0)
    save_train_state(str(tmp_path), "latest", state)
    fresh = _make_state(0.0)
    restored = restore_train_state(str(tmp_path), "latest", fresh)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 3.0))
    np.testing.assert_array_equal(np.asarray(restored.batch_stats["m"]),
                                  np.ones((4,)))


def test_checkpoint_manager_best_and_periodic(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep_every=10)
    state = _make_state(1.0)
    mgr.save(state, step=10, metric=5.0)
    mgr.save(_make_state(2.0), step=11, metric=3.0)  # better -> best
    mgr.save(_make_state(9.0), step=12, metric=9.0)  # worse -> not best
    assert os.path.isdir(os.path.join(tmp_path, "latest"))
    assert os.path.isdir(os.path.join(tmp_path, "best"))
    assert os.path.isdir(os.path.join(tmp_path, "step_00000010"))
    best = restore_train_state(str(tmp_path), "best", _make_state(0.0))
    np.testing.assert_array_equal(np.asarray(best.params["w"]), np.full((4, 4), 2.0))

    restored, ok = mgr.restore_latest(_make_state(0.0))
    assert ok
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4, 4), 9.0))

    # best_metric survives manager re-construction (resume must not clobber
    # the historical best with a worse first validation)
    mgr2 = CheckpointManager(str(tmp_path), keep_every=10)
    assert mgr2.best_metric == 3.0
    mgr2.save(_make_state(4.0), step=13, metric=4.0)  # worse than 3.0 -> not best
    best = restore_train_state(str(tmp_path), "best", _make_state(0.0))
    np.testing.assert_array_equal(np.asarray(best.params["w"]), np.full((4, 4), 2.0))


def test_best_checkpoint_metric_selects_epe_only():
    from raft_optical_flow_tpu.utils.checkpoint import best_checkpoint_metric

    # validate_sintel-style dict: accuracies (higher=better) must be ignored
    res = {"clean": 2.24, "clean_1px": 0.84, "clean_3px": 0.93, "clean_5px": 0.95}
    assert best_checkpoint_metric(res) == 2.24
    # KITTI: F1 ignored, EPE picked
    assert best_checkpoint_metric({"kitti-epe": 5.1, "kitti-f1": 17.4}) == 5.1
    # multiple EPE entries -> min over them
    assert best_checkpoint_metric({"clean": 2.0, "final": 3.5, "final_1px": 0.7}) == 2.0
    # nothing lower-is-better -> None (no best tracking)
    assert best_checkpoint_metric({"clean_1px": 0.9}) is None


def test_stablehlo_export_roundtrip(tmp_path):
    def fn(x, y):
        return jnp.tanh(x @ y) * 2.0

    ex = (jnp.ones((3, 4)), jnp.ones((4, 5)))
    path = str(tmp_path / "fn.stablehlo")
    export_stablehlo(fn, ex, path)
    assert os.path.getsize(path) > 0
    loaded = load_stablehlo(path)
    out = loaded.call(*ex)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(*ex)), rtol=1e-6)


def test_export_raft_roundtrip(tmp_path):
    """Full-model export: on the CPU backend the corr path lowers to portable
    XLA (no tpu_custom_call), so the artifact is cross-platform."""
    from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig
    from raft_optical_flow_tpu.utils.export import export_raft

    m = RAFT(RAFTConfig(small=True))
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), img, img, iters=1, test_mode=True)
    path = str(tmp_path / "raft.stablehlo")
    export_raft(v, path, small=True, iters=2, height=64, width=96)
    assert os.path.getsize(path) > 0
    out = load_stablehlo(path).call(img, img)
    assert out.shape == (1, 64, 96, 2)


def test_flow_viz_shapes():
    rng = np.random.RandomState(0)
    flow = rng.uniform(-10, 10, (32, 48, 2)).astype(np.float32)
    img = flow_to_image(flow)
    assert img.shape == (32, 48, 3) and img.dtype == np.uint8
    # zero flow maps to (near-)white center of the color wheel
    white = flow_to_image(np.zeros((8, 8, 2), np.float32))
    assert white.min() > 200


def test_tensorboard_writer(tmp_path):
    from raft_optical_flow_tpu.utils.logging import TensorBoardWriter

    w = TensorBoardWriter(str(tmp_path / "tb"))
    w.add_scalar("loss", 1.5, 1)
    w.add_scalars({"epe": 2.0, "1px": 0.5}, 2, prefix="val/")
    w.add_flow_image("flow", np.random.randn(16, 16, 2).astype(np.float32), 1)
    w.flush()
    w.close()
    files = list((tmp_path / "tb").glob("events.*"))
    assert files and files[0].stat().st_size > 0
