"""Eval-layer tests: validators, warm-start interpolation, submission writers."""

import os

import numpy as np
import jax.numpy as jnp

from raft_optical_flow_tpu.data.frame_utils import read_flow, read_flow_kitti
from raft_optical_flow_tpu.eval import evaluate as E


def _fake_fwd(flow_value):
    """A (image1, image2, flow_init) -> (flow_low, flow_up) stub returning a
    constant flow field at padded resolution."""

    def fwd(i1, i2, flow_init=None):
        N, H, W, _ = i1.shape
        flow = jnp.full((N, H, W, 2), flow_value, jnp.float32)
        low = jnp.full((N, H // 8, W // 8, 2), flow_value / 8.0, jnp.float32)
        return low, flow

    return fwd


def _samples(n=3, H=40, W=60, flow_gt=1.5):
    rng = np.random.RandomState(0)
    for _ in range(n):
        img1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        img2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
        flow = np.full((H, W, 2), flow_gt, np.float32)
        valid = np.ones((H, W), np.float32)
        yield img1, img2, flow, valid


def test_validate_sintel_exact_epe():
    # prediction 2.0 everywhere vs gt 1.5 -> epe = sqrt(2*0.25) per pixel
    res = E.validate_sintel(_fake_fwd(2.0), _samples(flow_gt=1.5), dstype="clean")
    expected = np.sqrt(2 * 0.5**2)
    np.testing.assert_allclose(res["clean"], expected, rtol=1e-6)
    assert res["clean_1px"] == 1.0  # epe ~0.707 < 1


def test_validate_chairs_and_kitti():
    res = E.validate_chairs(_fake_fwd(1.5), _samples(flow_gt=1.5))
    np.testing.assert_allclose(res["chairs"], 0.0, atol=1e-6)

    res = E.validate_kitti(_fake_fwd(1.5), _samples(flow_gt=1.5))
    np.testing.assert_allclose(res["kitti-epe"], 0.0, atol=1e-6)
    assert res["kitti-f1"] == 0.0


def test_forward_interpolate_identity_and_shift():
    zero = np.zeros((12, 16, 2), np.float32)
    out = E.forward_interpolate(zero)
    np.testing.assert_allclose(out, zero, atol=1e-6)

    const = np.full((12, 16, 2), 2.0, np.float32)
    out = E.forward_interpolate(const)
    # forward-advected constant flow stays constant in the interior
    np.testing.assert_allclose(out[4:-4, 4:-4], 2.0, atol=1e-5)


def test_sintel_submission_writer(tmp_path):
    frames = [
        (np.zeros((40, 60, 3), np.float32), np.zeros((40, 60, 3), np.float32), i)
        for i in range(2)
    ]
    E.create_sintel_submission(
        _fake_fwd(1.0), [("seq_a", frames)], output_path=str(tmp_path / "sub"),
        warm_start=True,
    )
    p = tmp_path / "sub" / "seq_a" / "frame0001.flo"
    assert p.exists()
    flow = read_flow(str(p))
    assert flow.shape == (40, 60, 2)
    np.testing.assert_allclose(flow, 1.0, atol=1e-5)


def test_kitti_submission_writer(tmp_path):
    frames = [
        (np.zeros((40, 60, 3), np.float32), np.zeros((40, 60, 3), np.float32),
         "000000_10.png")
    ]
    E.create_kitti_submission(_fake_fwd(1.0), frames, output_path=str(tmp_path / "k"))
    p = tmp_path / "k" / "000000_10.png"
    assert p.exists()
    flow, valid = read_flow_kitti(str(p))
    np.testing.assert_allclose(flow, 1.0, atol=1 / 64.0)
    assert valid.min() == 1.0
