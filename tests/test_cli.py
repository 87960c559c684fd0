"""CLI smoke tests: argument surfaces parse; demo runs end-to-end on synthetic data."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.parametrize(
    "module",
    [
        "raft_optical_flow_tpu.cli.train_raft",
        "raft_optical_flow_tpu.cli.train_flow",
        "raft_optical_flow_tpu.cli.evaluate",
        "raft_optical_flow_tpu.cli.demo",
    ],
)
def test_cli_help(module):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", module, "--help"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()


def _run(cmd, **kw):
    env = dict(os.environ)
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=env,
        timeout=600, **kw,
    )
    assert out.returncode == 0, f"{out.stderr[-3000:]}\n{out.stdout[-500:]}"
    return out


def test_train_raft_cli_one_step(tmp_path):
    """The full argparse -> StageConfig -> loader -> RAFTTrainer.run composition
    (`train.py:270-302` surface), executed for real on synthetic data."""
    _run([
        sys.executable, "-m", "raft_optical_flow_tpu.cli.train_raft",
        "--stage", "chairs", "--synthetic", "--small", "--platform", "cpu",
        "--num_steps", "1", "--batch_size", "8", "--image_size", "48", "64",
        "--iters", "2", "--val_freq", "1", "--num_workers", "1",
        "--checkpoint_dir", str(tmp_path),
    ])
    assert (tmp_path / "raft.npz").exists()
    assert (tmp_path / "raft_state" / "latest").exists()


def test_train_flow_cli_one_step(tmp_path):
    """argparse -> FlowTrainer.run for the non-RAFT families
    (`train_simple_flow.py` surface)."""
    _run([
        sys.executable, "-m", "raft_optical_flow_tpu.cli.train_flow",
        "--model", "simple_flow", "--synthetic", "--platform", "cpu",
        "--num_steps", "1", "--batch_size", "8", "--image_size", "64", "96",
        "--val_freq", "1", "--checkpoint_dir", str(tmp_path),
    ])
    assert (tmp_path / "simple_flow.npz").exists()


def test_evaluate_cli_synthetic():
    """cli/evaluate.py end to end over warped demo-frame pairs with exact GT
    (`evaluate.py:169-205` surface); metrics must be finite and printed."""
    out = _run([
        sys.executable, "-m", "raft_optical_flow_tpu.cli.evaluate",
        "--model", "checkpoints/raft_small.npz", "--small", "--platform", "cpu",
        "--dataset", "synthetic", "--iters", "4",
        "--synthetic_size", "96", "128", "--synthetic_samples", "2",
    ])
    assert "EPE" in out.stdout


def test_demo_synthetic_generator(tmp_path):
    from raft_optical_flow_tpu.cli.demo import create_demo_images

    p1, p2 = create_demo_images(str(tmp_path), size=64)
    from PIL import Image

    a = np.array(Image.open(p1))
    b = np.array(Image.open(p2))
    assert a.shape == (64, 64, 3)
    assert (a[..., 0] == 255).any() and (b[..., 0] == 255).any()
    assert not np.array_equal(a, b)
