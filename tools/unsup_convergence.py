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
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _prefetch(gen, depth: int = 2):
    """Overlap host-side batch synthesis with the device step (~120 ms/batch
    of numpy warping at 256x384 bs4 would otherwise serialize with the step)."""
    q = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        # propagate generator failures to the consumer instead of silently
        # ending the stream (a swallowed exception here used to surface as a
        # bare StopIteration with the real traceback lost in the daemon thread)
        try:
            for item in gen:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer side
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def run(kind: str, steps: int, batch_size: int = 8, crop=(64, 96),
        traj_every: int = 0, lr: float = 2e-4, step_kwargs_extra=None,
        max_flow=5.0, trainer=None):
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
    if step_kwargs_extra:
        step_kwargs = dict(step_kwargs or {}, **step_kwargs_extra)
    if trainer is None:
        trainer = FlowTrainer(
            trainer_kind, image_size=crop,
            optim=OptimConfig(lr=lr, step_size=max(steps, 1000)),
            step_kwargs=step_kwargs,
        )
    data = _prefetch(
        warped_pair_batches(batch_size, crop=crop, max_flow=max_flow, seed=11)
    )

    hist = []
    t0 = time.time()
    for step in range(steps):
        metrics = trainer.train_step(next(data))
        hist.append({k: float(v) for k, v in metrics.items()})
        if step == 0:
            print(f"{kind}: first step done ({time.time()-t0:.0f}s incl. compile)",
                  flush=True)
        if traj_every and (step + 1) % traj_every == 0:
            win = {k: round(float(np.mean([h[k] for h in hist[-traj_every:]])), 4)
                   for k in ("census", "epe", "loss", "photo") if k in metrics}
            print(f"{kind} step {step + 1}: {win} "
                  f"({(step + 1) / max(time.time() - t0, 1e-9):.2f} steps/s)",
                  flush=True)
    w = min(25, steps // 4)
    out = {"kind": kind, "steps": steps,
           "steps_per_sec": round((steps - 1) / max(time.time() - t0, 1e-9), 2)}
    for key in hist[0]:
        first = float(np.mean([h[key] for h in hist[:w]]))
        last = float(np.mean([h[key] for h in hist[-w:]]))
        out[key] = {"first": round(first, 4), "last": round(last, 4)}
    if traj_every:
        out["traj"] = {
            key: [round(float(np.mean([h[key] for h in hist[s:s + traj_every]])), 4)
                  for s in range(0, steps, traj_every)]
            for key in ("census", "epe", "loss") if key in hist[0]
        }
    print(json.dumps(out), flush=True)
    return out


def gt_census_floor(batches: int = 25, batch_size: int = 8, crop=(64, 96),
                    max_flow=5.0):
    """Census loss evaluated AT the ground-truth flow on the same data.

    Census compares (interpolation-blurred) warped images, so it has a data
    floor well above 0 — this measures it, giving the convergence runs an
    attainable target instead of an implicit 0. Backward flow is approximated
    by -gt (exact for constant fields, tight for the smooth low-frequency
    fields data/synthetic.py generates).
    """
    import jax
    import jax.numpy as jnp

    from raft_optical_flow_tpu.data.synthetic import warped_pair_batches
    from raft_optical_flow_tpu.losses import uflow

    def pyramid(flow):
        _, H, W, _ = flow.shape
        return [
            flow,
            uflow.resize(flow, H // 2, W // 2, is_flow=True),
            uflow.resize(flow, H // 4, W // 4, is_flow=True),
        ]

    @jax.jit
    def census_at(img1, img2, gt):
        fw = gt[..., ::-1]  # (x, y) -> losses/uflow.py's (y, x)
        flows = {}
        for key, f in (((0, 1), fw), ((1, 0), -fw)):
            flows[key + ("augmented-student",)] = pyramid(f)
            flows[key + ("original-teacher",)] = pyramid(f)
        warps, valid_masks, _, occ_masks, fb_sq, fb_sum = (
            uflow.compute_warps_and_occlusion(flows, "wang")
        )
        images = {0: img1 / 255.0, 1: img2 / 255.0}
        aug = {k: v for k, v in warps.items() if k[2] == "augmented-student"}
        warped = uflow.apply_warps_stop_grad(images, aug, level=0)
        losses = uflow.compute_loss(
            {"census": 1.0}, images, flows, warps, valid_masks, occ_masks,
            fb_sq, fb_sum, warped,
        )
        return losses["census"]

    data = warped_pair_batches(batch_size, crop=crop, max_flow=max_flow, seed=11)
    vals, zf = [], []
    for b in (next(data) for _ in range(batches)):
        vals.append(float(census_at(b["image1"], b["image2"], b["flow"])))
        # EPE of an all-zeros predictor == mean |gt| — the attractor reference
        # line the trained EPE must drop below (BENCH.md zero-flow diagnosis)
        zf.append(float(jnp.mean(jnp.linalg.norm(b["flow"], axis=-1))))
    out = {"kind": "gt_census_floor", "batches": batches,
           "census": {"mean": round(float(np.mean(vals)), 4),
                      "std": round(float(np.std(vals)), 4)},
           "zero_flow_epe": round(float(np.mean(zf)), 4)}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kinds", nargs="*", default=None)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--traj-every", type=int, default=0,
                    help="also emit windowed trajectory means every N steps")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--crop", type=int, nargs=2, default=(64, 96),
                    metavar=("H", "W"))
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-flow", type=float, default=5.0)
    ap.add_argument("--gt-floor", action="store_true",
                    help="also report census evaluated at the ground-truth flow")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to the CPU backend (the image's sitecustomize "
                         "force-registers the TPU; env vars alone don't stick)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    kinds = args.kinds or [
        "simple_flow_unsup", "lfn3_unsup", "ifnet_unsup", "raft_uflow_unsup"
    ]
    if args.gt_floor:
        gt_census_floor(batch_size=args.batch_size, crop=tuple(args.crop),
                        max_flow=args.max_flow)
    if args.steps > 0:  # --steps 0: gt-floor-only invocation
        for kind in kinds:
            run(kind, args.steps, batch_size=args.batch_size,
                crop=tuple(args.crop), traj_every=args.traj_every, lr=args.lr,
                max_flow=args.max_flow)


if __name__ == "__main__":
    main()
