"""Golden parity tests: JAX RAFT vs the reference torch implementation.

Fixtures in tests/goldens/raft_small.npz were produced by tools/make_goldens.py
(reference torch model + bundled raft-small.pth on real demo frames). The converted
checkpoint in checkpoints/raft_small.npz comes from tools/convert_checkpoints.py.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.models import RAFT, RAFTConfig
from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

REPO = os.path.join(os.path.dirname(__file__), "..")
GOLDEN = os.path.join(REPO, "tests", "goldens", "raft_small.npz")
CKPT = os.path.join(REPO, "checkpoints", "raft_small.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN) and os.path.exists(CKPT)),
    reason="golden fixtures or converted checkpoint missing",
)


@pytest.fixture(scope="module")
def setup():
    g = np.load(GOLDEN)
    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(CKPT))
    img1 = jnp.asarray(g["image1"], jnp.float32)[None]
    img2 = jnp.asarray(g["image2"], jnp.float32)[None]
    return g, variables, img1, img2


def test_encoder_parity(setup):
    g, variables, img1, img2 = setup
    from raft_optical_flow_tpu.models.extractor import SmallEncoder

    im1n = 2 * (img1 / 255.0) - 1
    im2n = 2 * (img2 / 255.0) - 1
    fm = SmallEncoder(128, "instance").apply(
        {"params": variables["params"]["fnet"]}, jnp.concatenate([im1n, im2n], 0)
    )
    fmap1, fmap2 = np.split(np.asarray(fm), 2, 0)
    assert np.abs(fmap1 - g["fmap1"]).max() < 1e-4
    assert np.abs(fmap2 - g["fmap2"]).max() < 1e-4

    cn = SmallEncoder(160, "none").apply({"params": variables["params"]["cnet"]}, im1n)
    assert np.abs(np.asarray(cn) - g["cnet"]).max() < 1e-4


def test_raft_small_test_mode_parity(setup):
    g, variables, img1, img2 = setup
    model = RAFT(RAFTConfig(small=True))
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=int(g["iters"]), test_mode=True))
    flow_low, flow_up = fwd(variables, img1, img2)
    assert np.abs(np.asarray(flow_low) - g["flow_low"]).max() < 2e-3
    epe = np.linalg.norm(np.asarray(flow_up) - g["flow_up"], axis=-1)
    assert epe.mean() < 1e-3, f"mean EPE delta vs torch = {epe.mean()}"
    assert epe.max() < 5e-3, f"max EPE delta vs torch = {epe.max()}"


def test_raft_small_train_mode_parity(setup):
    g, variables, img1, img2 = setup
    model = RAFT(RAFTConfig(small=True))
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=int(g["train_iters"])))
    preds = fwd(variables, img1, img2)
    assert preds.shape == (int(g["train_iters"]), 1, *img1.shape[1:3], 2)
    epe = np.linalg.norm(np.asarray(preds[-1]) - g["train_pred_last"], axis=-1)
    assert epe.mean() < 1e-3


def test_raft_alternate_corr_matches_allpairs(setup):
    """On-demand correlation path must agree with the materialized all-pairs path.

    (The reference's AlternateCorrBlock is the CUDA on-demand variant; here both are
    computed in XLA so they should match to float tolerance.)
    """
    g, variables, img1, img2 = setup
    # small crop for speed
    i1 = img1[:, :96, :128]
    i2 = img2[:, :96, :128]
    out_a = RAFT(RAFTConfig(small=True)).apply(variables, i1, i2, iters=4, test_mode=True)
    out_b = RAFT(RAFTConfig(small=True, alternate_corr=True)).apply(
        variables, i1, i2, iters=4, test_mode=True
    )
    err = np.abs(np.asarray(out_a[1]) - np.asarray(out_b[1])).max()
    assert err < 5e-3, f"alternate_corr diverges from all-pairs: {err}"
