"""SimpleFlowNet and IFNet parity tests vs reference golden fixtures.

Fixtures from tools/make_goldens_simple_ifnet.py (reference torch models with
seeded random weights, eval mode).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.losses.laploss import laploss
from raft_optical_flow_tpu.losses.simple_flow_loss import simple_flow_loss
from raft_optical_flow_tpu.models.ifnet import IFNet
from raft_optical_flow_tpu.models.simple_flow import SimpleFlowConfig, SimpleFlowNet
from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    g = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    variables = jax.tree.map(
        jnp.asarray, load_flax_checkpoint(os.path.join(GOLDENS, f"{name}_params.npz"))
    )
    return g, variables


def test_simple_flow_parity():
    g, variables = _load("simple_flow")
    img1 = jnp.asarray(g["img1"]).transpose(0, 2, 3, 1)
    img2 = jnp.asarray(g["img2"]).transpose(0, 2, 3, 1)
    preds = SimpleFlowNet(SimpleFlowConfig()).apply(variables, img1, img2)
    assert len(preds) == 3
    for i, p in enumerate(preds):
        ref = g[f"flow_{i}"]
        ours = np.asarray(p).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, atol=1e-3, err_msg=f"flow_{i}")


def test_simple_flow_bf16_policy_close():
    """bf16 compute policy vs the fp32 golden (CPU half of the bf16 gate)."""
    g, variables = _load("simple_flow")
    img1 = jnp.asarray(g["img1"]).transpose(0, 2, 3, 1)
    img2 = jnp.asarray(g["img2"]).transpose(0, 2, 3, 1)
    preds = SimpleFlowNet(
        SimpleFlowConfig(compute_dtype=jnp.bfloat16)
    ).apply(variables, img1, img2)
    for i, p in enumerate(preds):
        ours = np.asarray(p)
        assert ours.dtype == np.float32
        diff = np.abs(ours.transpose(0, 3, 1, 2) - g[f"flow_{i}"])
        # outputs are x20-scaled; bf16 rounds the decoder head per scale
        # (measured mean deltas 0.003/0.009/0.020 across the three scales,
        # ~0.3% of the flow magnitude)
        assert diff.mean() < 4e-2, (i, diff.mean())
        assert diff.max() < 2e-1, (i, diff.max())


def test_simple_flow_loss_runs():
    g, variables = _load("simple_flow")
    img1 = jnp.asarray(g["img1"]).transpose(0, 2, 3, 1)
    img2 = jnp.asarray(g["img2"]).transpose(0, 2, 3, 1)
    preds = SimpleFlowNet(SimpleFlowConfig()).apply(variables, img1, img2)
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.uniform(-3, 3, (1, 64, 96, 2)), jnp.float32)
    loss, metrics = simple_flow_loss(preds, gt, image=img1)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert set(metrics) >= {"epe", "edge", "total"}


def test_ifnet_parity():
    g, variables = _load("ifnet")
    img0 = jnp.asarray(g["img0"]).transpose(0, 2, 3, 1)
    img1 = jnp.asarray(g["img1"]).transpose(0, 2, 3, 1)
    flow_list, mask_list, warped_list = IFNet().apply(
        variables, img0, img1, scale=(4, 2, 1), timestep=0.5
    )
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(flow_list[i]).transpose(0, 3, 1, 2), g[f"flow_{i}"],
            atol=2e-3, err_msg=f"flow_{i}",
        )
        np.testing.assert_allclose(
            np.asarray(mask_list[i]).transpose(0, 3, 1, 2), g[f"mask_{i}"],
            atol=1e-3, err_msg=f"mask_{i}",
        )
        np.testing.assert_allclose(
            np.asarray(warped_list[i][0]).transpose(0, 3, 1, 2), g[f"warped0_{i}"],
            atol=1e-3, err_msg=f"warped0_{i}",
        )
        np.testing.assert_allclose(
            np.asarray(warped_list[i][1]).transpose(0, 3, 1, 2), g[f"warped1_{i}"],
            atol=1e-3, err_msg=f"warped1_{i}",
        )


def test_ifnet_bf16_policy_close():
    """bf16 compute policy vs the fp32 golden (CPU half of the bf16 gate)."""
    g, variables = _load("ifnet")
    img0 = jnp.asarray(g["img0"]).transpose(0, 2, 3, 1)
    img1 = jnp.asarray(g["img1"]).transpose(0, 2, 3, 1)
    flow_list, mask_list, _ = IFNet(compute_dtype=jnp.bfloat16).apply(
        variables, img0, img1, scale=(4, 2, 1), timestep=0.5
    )
    ours = np.asarray(flow_list[-1])
    assert ours.dtype == np.float32
    diff = np.abs(ours.transpose(0, 3, 1, 2) - g["flow_2"])
    assert diff.mean() < 5e-3, diff.mean()
    assert diff.max() < 5e-2, diff.max()
    assert np.asarray(mask_list[-1]).dtype == np.float32


def test_ifnet_feature_res_warp_close():
    """Serving restructure gate: warping at each block's input resolution
    (feature_res_warp=True — the warp commutes past the downsample) must stay
    close to the reference warp-then-downsample order. Block 0 has no incoming
    flow so its output is bit-identical; later blocks see a ~3%-of-magnitude
    perturbation on the two warped input channels only (measured mean 0.023 on
    flow |mean| 0.73 for the golden fixture)."""
    g, variables = _load("ifnet")
    img0 = jnp.asarray(g["img0"]).transpose(0, 2, 3, 1)
    img1 = jnp.asarray(g["img1"]).transpose(0, 2, 3, 1)
    base, _, _ = IFNet().apply(variables, img0, img1, scale=(4, 2, 1))
    frw, _, _ = IFNet(feature_res_warp=True).apply(
        variables, img0, img1, scale=(4, 2, 1)
    )
    np.testing.assert_array_equal(np.asarray(frw[0]), np.asarray(base[0]))
    for i in (1, 2):
        diff = np.abs(np.asarray(frw[i]) - np.asarray(base[i]))
        assert diff.mean() < 0.06, (i, diff.mean())
        assert diff.max() < 0.5, (i, diff.max())


def test_laploss_runs_and_grads():
    g, variables = _load("ifnet")
    img0 = jnp.asarray(g["img0"]).transpose(0, 2, 3, 1)
    img1 = jnp.asarray(g["img1"]).transpose(0, 2, 3, 1)
    model = IFNet()

    def loss_fn(params):
        _, _, warped_list = model.apply({"params": params}, img0, img1)
        loss, metrics = laploss(warped_list, img0, img1)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)
