"""Unsupervised training convergence runs (VERDICT round-1 item 6).

Trains each unsupervised trainer for a few hundred SPMD steps on warped-pair
data built from the real demo frames (data/synthetic.py — real photometric
structure, exact ground-truth flow) and reports: total/photometric loss trend
(first-25-step mean vs last-25) and EPE vs the known flow. Decreasing loss +
improving EPE = the losses, custom-VJP kernels, and optimizer converge
together; EPE is monitoring-only (never trained on), matching
`train_simple_flow_unsupervised.py:544-571`.

Usage: python tools/unsup_convergence.py [kind ...] [--steps N]
Kinds: simple_flow_unsup lfn3_unsup ifnet_unsup raft_uflow_unsup
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def run(kind: str, steps: int, batch_size: int = 8, crop=(64, 96)):
    import jax

    from raft_optical_flow_tpu.data.synthetic import warped_pair_batches
    from raft_optical_flow_tpu.train.trainers import FlowTrainer, OptimConfig

    # 'raft_uflow_photo' = the photometric-only ablation of the UFlow recipe
    # (census + smooth2, no selfsup / student passes) — the control the full
    # recipe's EPE must beat (round-3 VERDICT item 6).
    step_kwargs = None
    trainer_kind = kind
    if kind == "raft_uflow_photo":
        trainer_kind = "raft_uflow_unsup"
        step_kwargs = {"weights": {
            "census": 1.0, "smooth2": 2.0, "edge_constant": 150.0}}
    trainer = FlowTrainer(
        trainer_kind, image_size=crop,
        optim=OptimConfig(lr=2e-4, step_size=max(steps, 1000)),
        step_kwargs=step_kwargs,
    )
    data = warped_pair_batches(batch_size, crop=crop, max_flow=5.0, seed=11)

    hist = []
    t0 = time.time()
    for step in range(steps):
        metrics = trainer.train_step(next(data))
        hist.append({k: float(v) for k, v in metrics.items()})
        if step == 0:
            print(f"{kind}: first step done ({time.time()-t0:.0f}s incl. compile)",
                  flush=True)
    w = min(25, steps // 4)
    out = {"kind": kind, "steps": steps,
           "steps_per_sec": round((steps - 1) / max(time.time() - t0, 1e-9), 2)}
    for key in hist[0]:
        first = float(np.mean([h[key] for h in hist[:w]]))
        last = float(np.mean([h[key] for h in hist[-w:]]))
        out[key] = {"first": round(first, 4), "last": round(last, 4)}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kinds", nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()
    kinds = args.kinds or [
        "simple_flow_unsup", "lfn3_unsup", "ifnet_unsup", "raft_uflow_unsup"
    ]
    for kind in kinds:
        run(kind, args.steps)


if __name__ == "__main__":
    main()
