"""Measure the reference RAFT's 12->32 iteration cost scaling on torch CPU.

Supports the A100 baseline derivation in BASELINE.md: the published anchor
(RAFT paper, 10 pairs/s on a 1080Ti at 1088x436) is commonly cited at 12
refinement iterations; bench.py's 32-iteration baseline needs the reference's
own cost(32)/cost(12) ratio. The ratio of iteration counts is architecture-
determined (iteration-independent encoders + per-iteration GRU/lookup), so a
CPU measurement of the SAME code path transfers to GPU to first order.

Usage: python tools/measure_reference_iter_scaling.py
"""

import argparse
import sys
import time

import numpy as np

REFERENCE = "/root/reference"


def main():
    sys.path.insert(0, REFERENCE + "/core")
    import torch
    from raft import RAFT  # reference model, imported (not copied) for measurement

    torch.set_num_threads(max(1, torch.get_num_threads()))
    args = argparse.Namespace(
        small=False, mixed_precision=False, alternate_corr=False, dropout=0
    )
    model = RAFT(args).eval()

    # Full RAFT at a reduced spatial size (CPU): the base/per-iter cost split is
    # what we need, and it is resolution-independent to first order.
    H, W = 256, 512
    g = torch.Generator().manual_seed(0)
    img1 = torch.rand((1, 3, H, W), generator=g) * 255
    img2 = torch.rand((1, 3, H, W), generator=g) * 255

    def run(iters, reps=3):
        with torch.no_grad():
            model(img1, img2, iters=iters, test_mode=True)  # warmup
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                model(img1, img2, iters=iters, test_mode=True)
                times.append(time.perf_counter() - t0)
        return min(times)

    t12 = run(12)
    t32 = run(32)
    # linear fit: t(i) = base + i * per_iter
    per_iter = (t32 - t12) / 20.0
    base = t12 - 12 * per_iter
    print(f"torch CPU, full RAFT, {H}x{W}:")
    print(f"  t(12 iters) = {t12*1e3:.1f} ms   t(32 iters) = {t32*1e3:.1f} ms")
    print(f"  base = {base*1e3:.1f} ms   per-iter = {per_iter*1e3:.2f} ms")
    print(f"  cost(32)/cost(12) = {t32/t12:.3f}")
    print(f"  pairs/s CPU at 32 iters ({H}x{W}) = {1.0/t32:.3f}")


if __name__ == "__main__":
    main()
