"""Measure reference-torch CPU time ratios: LFN3 / LFN3S / IFNet vs RAFT.

Supports the per-family GPU baseline derivation in BASELINE.md (round-4
VERDICT item 6): the reference records a GPU figure only for RAFT (via the
paper anchor) and SimpleFlowNet (`README_simple_flow.md:122-125`); LFN3 and
IFNet have nothing to compare against. The defensible route without GPU
access is the one BASELINE.md already uses twice (iteration scaling, train
ratio): measure the reference torch models on this box's CPU — the SAME code
path the anchor applies to — and transfer the *ratio* to the derived A100
RAFT figure:

    A100_family pairs/s ~= A100_RAFT32 pairs/s x t_RAFT32_cpu / t_family_cpu

The ratio transfers to first order because all four families are conv/matmul
dominated (same arithmetic class, no family is unusually gather-bound on
GPU); the uplift-band spread from the RAFT derivation (x2.5-4.0 over 1080Ti)
carries through unchanged.

All models run at the SAME 256x512 input (divisible by 32 for LFN3's
InputScaler, by 8 for RAFT) so the ratio is shape-consistent; the absolute
CPU times are irrelevant, only ratios are used.

Usage: python tools/measure_reference_family_ratios.py [--reps 3]
"""

import argparse
import sys
import time

REFERENCE = "/root/reference"
A100_RAFT32 = 13.0  # pairs/s, BASELINE.md "A100 baseline derivation"


def timed(fn, reps):
    fn()  # warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, REFERENCE + "/core")
    import torch
    from IFNET_m import IFNet_m_flow
    from liteflownet3_simple import LiteFlowNet3
    from raft import RAFT  # reference models, imported (not copied) for measurement

    H, W = 256, 512
    g = torch.Generator().manual_seed(0)
    img1 = torch.rand((1, 3, H, W), generator=g)
    img2 = torch.rand((1, 3, H, W), generator=g)

    results = {}
    with torch.no_grad():
        raft_args = argparse.Namespace(
            small=False, mixed_precision=False, alternate_corr=False, dropout=0)
        raft = RAFT(raft_args).eval()
        results["raft32"] = timed(
            lambda: raft(img1 * 255, img2 * 255, iters=32, test_mode=True),
            args.reps)
        del raft

        for tag, s in (("lfn3", False), ("lfn3s", True)):
            m = LiteFlowNet3(use_s_version=s).eval()
            x = {"images": torch.stack([img1, img2], dim=1)}
            results[tag] = timed(lambda: m(x), args.reps)
            del m

        ifnet = IFNet_m_flow().eval()
        xcat = torch.cat([img1, img2], dim=1)
        results["ifnet"] = timed(
            lambda: ifnet(xcat, scale=[4, 2, 1], timestep=0.5), args.reps)

    print(f"torch CPU, {H}x{W}, min of {args.reps}:")
    t_raft = results["raft32"]
    print(f"  raft-standard 32 iters: {t_raft*1e3:8.1f} ms  (anchor family)")
    for tag in ("lfn3", "lfn3s", "ifnet"):
        t = results[tag]
        ratio = t_raft / t
        derived = A100_RAFT32 * ratio
        lo, hi = derived * 2.5 / 3.0, derived * 4.0 / 3.0
        print(f"  {tag:6s}: {t*1e3:8.1f} ms  raft32/{tag} = {ratio:6.2f}x"
              f"  -> derived A100 ~= {derived:7.1f} pairs/s"
              f"  (band {lo:.1f}-{hi:.1f})")


if __name__ == "__main__":
    main()
