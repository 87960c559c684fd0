"""LiteFlowNet3 parity tests vs reference golden fixtures.

Fixtures (tests/goldens/lfn3_*.npz) were produced by tools/make_goldens_lfn3.py:
the reference torch model with seeded random weights in eval mode, plus the
converted state_dict. Covers standard and S+pseudoreg variants (all module types).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.models.liteflownet3 import (
    LFN3Config,
    LiteFlowNet3,
)
from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _run(name, config):
    g = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(
        os.path.join(GOLDENS, f"{name}_params.npz")))
    images = jnp.asarray(g["images"]).transpose(0, 1, 3, 4, 2)  # -> [B,2,H,W,3]
    model = LiteFlowNet3(config)
    out = model.apply(variables, images, training=True)
    return g, out


@pytest.mark.parametrize(
    "name,config",
    [
        ("lfn3_standard", LFN3Config()),
        ("lfn3_s_pseudoreg", LFN3Config(use_s_version=True, use_pseudo_regularization=True)),
    ],
)
def test_lfn3_parity(name, config):
    g, out = _run(name, config)

    # final flow is x div_flow(=20) and runs through the deconv cascade, so float
    # noise accumulates; tolerance is absolute-dominated (values are O(0.01-1)).
    flows = np.asarray(out["flows"]).transpose(0, 1, 4, 2, 3)  # -> [B,1,2,H,W]
    confs = np.asarray(out["confs"]).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(flows, g["flows"], atol=3e-3)
    np.testing.assert_allclose(confs, g["confs"], atol=1e-3)

    for i, f in enumerate(out["flow_preds"]):
        ref = g[f"flow_pred_{i}"]
        ours = np.asarray(f).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, atol=5e-4, err_msg=f"flow_pred_{i}")
    for i, c in enumerate(out["conf_preds"]):
        ref = g[f"conf_pred_{i}"]
        ours = np.asarray(c).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref, atol=5e-4, err_msg=f"conf_pred_{i}")


def test_lfn3_bf16_policy_close():
    """compute_dtype=bf16 (mixed-precision serving) stays close to the fp32
    golden and returns fp32 outputs — the CPU half of the round-5 bf16 gate
    (the hardware half is bench_families' fidelity row)."""
    g, out = _run("lfn3_standard", LFN3Config(compute_dtype=jnp.bfloat16))
    flows = np.asarray(out["flows"])
    assert flows.dtype == np.float32
    diff = np.abs(flows.transpose(0, 1, 4, 2, 3) - g["flows"])
    # final flow values are O(0.01-1) at these random weights; bf16 conv
    # outputs round at ~0.4% per stage
    assert diff.mean() < 5e-3, diff.mean()
    assert diff.max() < 5e-2, diff.max()
    confs = np.asarray(out["confs"])
    assert confs.dtype == np.float32
    assert np.abs(confs.transpose(0, 1, 4, 2, 3) - g["confs"]).mean() < 5e-3


def test_lfn3_nondivisible_input_shapes():
    """InputScaler path: arbitrary H, W in, same H, W out."""
    g = np.load(os.path.join(GOLDENS, "lfn3_standard.npz"))
    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(
        os.path.join(GOLDENS, "lfn3_standard_params.npz")))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(0, 1, (1, 2, 50, 70, 3)), jnp.float32)
    out = LiteFlowNet3(LFN3Config()).apply(variables, images)
    assert out["flows"].shape == (1, 1, 50, 70, 2)
    assert out["confs"].shape == (1, 1, 50, 70, 1)
    assert np.isfinite(np.asarray(out["flows"])).all()
