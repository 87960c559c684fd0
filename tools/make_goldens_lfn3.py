"""Generate LiteFlowNet3 golden parity fixtures from the reference implementation.

No pretrained LFN3 checkpoint is bundled in the reference repo (the download URL
needs network), so the oracle is the reference torch model with *seeded random
weights* in eval mode: we save the state_dict (converted to the flax layout) plus
input/output tensors, covering the standard and S+pseudoreg variants so every module
type is exercised. Tests then validate the JAX model against these fixtures without
needing torch at test time.

Usage: python tools/make_goldens_lfn3.py
"""

import os
import sys

import numpy as np

REFERENCE = "/root/reference"
REPO = os.path.join(os.path.dirname(__file__), "..")
OUT_DIR = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, REPO)
sys.path.insert(0, REFERENCE)

from raft_optical_flow_tpu.utils.torch_convert import (  # noqa: E402
    save_flax_checkpoint,
    torch_state_dict_to_flax,
)


def make_golden(name: str, **model_kwargs):
    import torch
    from liteflownet3_simple import LiteFlowNet3  # reference model as oracle

    torch.manual_seed(0)
    model = LiteFlowNet3(**model_kwargs)
    model.eval()

    rng = np.random.RandomState(42)
    # H, W divisible by 32 so the InputScaler resize is identity (isolates model parity)
    images = rng.uniform(0, 1, (1, 2, 3, 64, 96)).astype(np.float32)

    with torch.no_grad():
        out = model({"images": torch.from_numpy(images)})
        model.train()
        out_train = model({"images": torch.from_numpy(images)})
        model.eval()

    variables = torch_state_dict_to_flax(model.state_dict())
    save_flax_checkpoint(variables, os.path.join(OUT_DIR, f"{name}_params.npz"))

    fixtures = {
        "images": images,
        "flows": out["flows"].numpy(),
        "confs": out["confs"].numpy(),
    }
    for i, f in enumerate(out_train["flow_preds"]):
        fixtures[f"flow_pred_{i}"] = f.numpy()
    for i, c in enumerate(out_train["conf_preds"]):
        fixtures[f"conf_pred_{i}"] = c.numpy()

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(OUT_DIR, f"{name}.npz"), **fixtures)
    print(
        f"wrote {name}.npz:",
        {k: v.shape for k, v in fixtures.items()},
    )


if __name__ == "__main__":
    make_golden("lfn3_standard")
    make_golden(
        "lfn3_s_pseudoreg", use_s_version=True, use_pseudo_regularization=True
    )
