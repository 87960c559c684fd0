"""Generate golden parity fixtures from the reference PyTorch implementation.

Runs the reference RAFT (torch, CPU) on real demo-frame crops with the bundled
raft-small.pth checkpoint and stores inputs + outputs as .npz fixtures under
tests/goldens/. Tests then validate the JAX implementation against these fixtures
without needing torch or /root/reference at test time.

Usage: python tools/make_goldens.py
"""

import argparse
import os
import sys

import numpy as np

REFERENCE = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def make_raft_small_golden():
    sys.path.insert(0, os.path.join(REFERENCE, "core"))
    import torch
    from PIL import Image
    from raft import RAFT  # reference model, imported (not copied) to produce oracles

    args = argparse.Namespace(
        small=True, mixed_precision=False, alternate_corr=False, dropout=0
    )
    model = RAFT(args)
    sd = torch.load(os.path.join(REFERENCE, "raft-small.pth"), map_location="cpu")
    model.load_state_dict({k.replace("module.", "", 1): v for k, v in sd.items()})
    model.eval()

    f1 = np.array(Image.open(os.path.join(REFERENCE, "demo-frames", "frame_0016.png")))
    f2 = np.array(Image.open(os.path.join(REFERENCE, "demo-frames", "frame_0017.png")))
    # crop with visible motion, divisible by 8, small enough for fast CPU tests
    crop = (slice(104, 104 + 192), slice(384, 384 + 320))
    img1 = f1[crop].astype(np.float32)
    img2 = f2[crop].astype(np.float32)

    t1 = torch.from_numpy(img1).permute(2, 0, 1)[None]
    t2 = torch.from_numpy(img2).permute(2, 0, 1)[None]

    with torch.no_grad():
        flow_low, flow_up = model(t1, t2, iters=8, test_mode=True)
        # also capture intermediate encoder outputs for debugging parity drift
        im1n = (2 * (t1 / 255.0) - 1.0).contiguous()
        im2n = (2 * (t2 / 255.0) - 1.0).contiguous()
        fmap1, fmap2 = model.fnet([im1n, im2n])
        cnet = model.cnet(im1n)
        preds = model(t1, t2, iters=4, test_mode=False)

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(
        os.path.join(OUT_DIR, "raft_small.npz"),
        image1=img1.astype(np.uint8),
        image2=img2.astype(np.uint8),
        flow_low=flow_low.numpy().transpose(0, 2, 3, 1),
        flow_up=flow_up.numpy().transpose(0, 2, 3, 1),
        fmap1=fmap1.numpy().transpose(0, 2, 3, 1),
        fmap2=fmap2.numpy().transpose(0, 2, 3, 1),
        cnet=cnet.numpy().transpose(0, 2, 3, 1),
        train_pred_last=preds[-1].numpy().transpose(0, 2, 3, 1),
        iters=np.array(8),
        train_iters=np.array(4),
    )
    print("wrote raft_small.npz",
          {k: v.shape for k, v in np.load(os.path.join(OUT_DIR, "raft_small.npz")).items()})


if __name__ == "__main__":
    make_raft_small_golden()
