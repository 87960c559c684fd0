"""Golden parity fixtures for SimpleFlowNet and IFNet from the reference (torch).

Seeded random weights, eval mode; saves converted state_dicts plus input/output
tensors. Usage: python tools/make_goldens_simple_ifnet.py
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


def make_simple_flow():
    import torch
    from simple_flow_net import SimpleFlowNet  # reference oracle

    torch.manual_seed(0)
    model = SimpleFlowNet()
    model.eval()
    rng = np.random.RandomState(7)
    img1 = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    img2 = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        preds = model(torch.from_numpy(img1), torch.from_numpy(img2))

    save_flax_checkpoint(
        torch_state_dict_to_flax(model.state_dict()),
        os.path.join(OUT_DIR, "simple_flow_params.npz"),
    )
    fixtures = {"img1": img1, "img2": img2}
    for i, p in enumerate(preds):
        fixtures[f"flow_{i}"] = p.numpy()
    np.savez_compressed(os.path.join(OUT_DIR, "simple_flow.npz"), **fixtures)
    print("wrote simple_flow.npz:", {k: v.shape for k, v in fixtures.items()})


def make_ifnet():
    import torch
    from IFNET_m import IFNet_m_flow  # reference oracle

    torch.manual_seed(0)
    model = IFNet_m_flow()
    model.eval()
    rng = np.random.RandomState(8)
    img0 = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    img1 = rng.uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    x = torch.from_numpy(np.concatenate([img0, img1], axis=1))
    with torch.no_grad():
        flow_list, mask_list, warped_list = model(x, scale=[4, 2, 1], timestep=0.5)

    save_flax_checkpoint(
        torch_state_dict_to_flax(model.state_dict()),
        os.path.join(OUT_DIR, "ifnet_params.npz"),
    )
    fixtures = {"img0": img0, "img1": img1}
    for i in range(3):
        fixtures[f"flow_{i}"] = flow_list[i].numpy()
        fixtures[f"mask_{i}"] = mask_list[i].numpy()
        fixtures[f"warped0_{i}"] = warped_list[i][0].numpy()
        fixtures[f"warped1_{i}"] = warped_list[i][1].numpy()
    np.savez_compressed(os.path.join(OUT_DIR, "ifnet.npz"), **fixtures)
    print("wrote ifnet.npz:", {k: v.shape for k, v in fixtures.items()})


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    make_simple_flow()
    make_ifnet()
