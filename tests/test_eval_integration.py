"""Integration: RAFT forward + real validator over an on-disk mini dataset."""

import numpy as np
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.data.datasets import MpiSintelVal
from raft_optical_flow_tpu.eval import evaluate as E
from raft_optical_flow_tpu.models.raft import RAFTConfig
from test_data_layer import _make_mini_sintel


def test_validate_sintel_with_raft_small(tmp_path):
    root = str(tmp_path / "sintel")
    _make_mini_sintel(root, scenes=("ambush_2",), frames=3, hw=(64, 96))

    import os

    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "raft_small.npz")
    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(ckpt))
    config = RAFTConfig(small=True)
    fwd = E.make_raft_forward(config, variables, iters=4)

    ds = MpiSintelVal(None, root=root, dstype="clean")
    assert len(ds) == 2
    samples = [ds.__getitem__(i) for i in range(len(ds))]
    res = E.validate_sintel(fwd, samples, dstype="clean")
    # random-noise gt vs real model: just check the pipeline produces finite metrics
    assert np.isfinite(res["clean"]) and 0 <= res["clean_1px"] <= 1


def test_validate_sintel_with_lfn3(tmp_path):
    """The LFN3 eval adapter through the same validator."""
    root = str(tmp_path / "sintel")
    _make_mini_sintel(root, scenes=("ambush_2",), frames=3, hw=(64, 96))

    import os

    from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config
    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    params = os.path.join(os.path.dirname(__file__), "goldens",
                          "lfn3_standard_params.npz")
    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(params))
    fwd = E.make_lfn3_forward(LFN3Config(), variables)

    ds = MpiSintelVal(None, root=root, dstype="clean")
    samples = [ds.__getitem__(i) for i in range(len(ds))]
    res = E.validate_sintel(fwd, samples, dstype="clean")
    assert np.isfinite(res["clean"])
