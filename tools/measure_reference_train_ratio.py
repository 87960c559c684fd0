"""Measure the reference RAFT's forward -> full-train-step cost multiplier.

Supports the A100 TRAINING baseline derivation in BASELINE.md: the published
inference anchor (10 pairs/s on a 1080Ti, 12 iters) needs the reference's own
fwd-to-train-step ratio to become a training baseline. The ratio (sequence
loss over 12 upsampled predictions + backward + AdamW step vs a pure forward)
is architecture-determined, so a CPU measurement of the SAME code path
(`train.py:195-234` semantics) transfers to GPU to first order.

Usage: python tools/measure_reference_train_ratio.py
"""

import argparse
import sys
import time

REFERENCE = "/root/reference"


def main():
    sys.path.insert(0, REFERENCE + "/core")
    sys.path.insert(0, REFERENCE)
    import types

    import torch

    # train.py transitively imports torchvision (via datasets/augmentor) which
    # is absent in this image and unused by sequence_loss — stub it out.
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.ColorJitter = object
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)

    from raft import RAFT  # reference model, imported (not copied) for measurement
    from train import sequence_loss  # reference loss, same reason

    args = argparse.Namespace(
        small=False, mixed_precision=False, alternate_corr=False, dropout=0,
        clip=1.0, lr=1.25e-4, wdecay=1e-4, epsilon=1e-8, num_steps=100,
    )
    model = RAFT(args).train()
    for m in model.modules():  # freeze_bn, as the non-chairs stages do
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
    opt = torch.optim.AdamW(model.parameters(), lr=args.lr,
                            weight_decay=args.wdecay, eps=args.epsilon)

    H, W = 256, 512  # reduced CPU size; the fwd:train ratio is what transfers
    g = torch.Generator().manual_seed(0)
    img1 = torch.rand((1, 3, H, W), generator=g) * 255
    img2 = torch.rand((1, 3, H, W), generator=g) * 255
    flow = torch.rand((1, 2, H, W), generator=g) * 10 - 5
    valid = torch.ones((1, H, W))

    def fwd(reps=3):
        with torch.no_grad():
            model(img1, img2, iters=12)  # warmup
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                model(img1, img2, iters=12)
                times.append(time.perf_counter() - t0)
        return min(times)

    def train_step(reps=3):
        times = []
        for i in range(reps + 1):  # first is warmup
            t0 = time.perf_counter()
            opt.zero_grad()
            preds = model(img1, img2, iters=12)
            loss, _ = sequence_loss(preds, flow, valid, gamma=0.85)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), args.clip)
            opt.step()
            if i > 0:
                times.append(time.perf_counter() - t0)
        return min(times)

    tf = fwd()
    tt = train_step()
    print(f"torch CPU, full RAFT, {H}x{W}, 12 iters, batch 1:")
    print(f"  forward       = {tf*1e3:.1f} ms")
    print(f"  train step    = {tt*1e3:.1f} ms (fwd + seq loss + bwd + clip + AdamW)")
    print(f"  ratio train/fwd = {tt/tf:.3f}")


if __name__ == "__main__":
    main()
