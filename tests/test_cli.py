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


def test_demo_synthetic_generator(tmp_path):
    from raft_optical_flow_tpu.cli.demo import create_demo_images

    p1, p2 = create_demo_images(str(tmp_path), size=64)
    from PIL import Image

    a = np.array(Image.open(p1))
    b = np.array(Image.open(p2))
    assert a.shape == (64, 64, 3)
    assert (a[..., 0] == 255).any() and (b[..., 0] == 255).any()
    assert not np.array_equal(a, b)
