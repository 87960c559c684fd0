"""A/B matrix for the round-5 training-throughput regression hunt (VERDICT
item 2): the r5 HEAD measured 160.3 ms/step at bs4 368x496 vs 143.3 at the r4
measurement tree and 132.2 at the r3 pre-rework tree — the end-of-round-4
commits (checkpointed convex upsample, flat subpixel axis, bf16 cotangent
emit) landed unmeasured, and this tool measures each suspect independently in
ONE process:

  - ckpt={1,0}   RAFTConfig(checkpoint_upsample=...) — store vs recompute the
                 per-iteration upsample intermediates in the backward.
  - flat={1,0}   RAFT_TPU_FLAT_BWD env — the lookup-VJP cotangent design:
                 flat-lane VMEM unflatten (round-3 rework) vs XLA reshape
                 (round-2 design). Read at trace time, so flipping the env
                 between jits inside one process works.

Each combo compiles its own executable (~10-17 min through the tunnel); run in
background. Same methodology as tools/bench_train.py (K-step donated
dispatches, min over reps, one sync per K).

Usage: python tools/bench_train_ab.py [--k 8] [--reps 3] [--combos 11,10,01,00]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench_combo(ckpt: bool, flat: bool, k: int, reps: int):
    from raft_optical_flow_tpu.models import RAFTConfig
    from raft_optical_flow_tpu.train.configs import StageConfig
    from raft_optical_flow_tpu.train.trainer import create_train_state, raft_train_step

    os.environ["RAFT_TPU_FLAT_BWD"] = "1" if flat else "0"
    batch, H, W = 4, 368, 496
    config = RAFTConfig(small=False, compute_dtype=jnp.bfloat16,
                        checkpoint_upsample=ckpt)
    stage = StageConfig(name="bench", stage="things", num_steps=100,
                        batch_size=batch, lr=1.25e-4, image_size=(H, W))
    key = jax.random.PRNGKey(0)
    state = create_train_state(key, config, stage, (H, W))
    data = {
        "image1": jax.random.uniform(key, (batch, H, W, 3), jnp.float32, 0, 255),
        "image2": jax.random.uniform(key, (batch, H, W, 3), jnp.float32, 0, 255),
        "flow": jax.random.uniform(key, (batch, H, W, 2), jnp.float32, -5, 5),
        "valid": jnp.ones((batch, H, W), jnp.float32),
    }
    step = jax.jit(
        lambda s, b, r: raft_train_step(s, b, r, config=config, iters=12,
                                        freeze_bn=True),
        donate_argnums=(0,),
    )
    t0 = time.time()
    state, metrics = step(state, data, key)
    loss = float(metrics["loss"])  # sync: compile + first step
    compile_s = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            state, metrics = step(state, data, key)
        loss = float(metrics["loss"])
        times.append((time.perf_counter() - t0) / k)
    ms = float(np.min(times) * 1e3)
    row = {"ms_per_step": round(ms, 1),
           "samples_per_sec_chip": round(batch / (ms / 1e3), 2),
           "compile_s": round(compile_s, 1),
           "loss_finite": bool(np.isfinite(loss))}
    print(f"ckpt={int(ckpt)} flat={int(flat)}  {ms:8.1f} ms/step  "
          f"{row['samples_per_sec_chip']:6.2f} samples/s  "
          f"(compile {compile_s:.0f}s, loss finite={row['loss_finite']})",
          flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--combos", default="01,00,10,11",
                    help="comma list of <ckpt><flat> bits")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    from bench import git_stamp

    print(json.dumps({"git_rev": git_stamp()}), flush=True)
    rows = {}
    for combo in args.combos.split(","):
        ckpt, flat = combo[0] == "1", combo[1] == "1"
        rows[f"ckpt{int(ckpt)}_flat{int(flat)}"] = bench_combo(
            ckpt, flat, args.k, args.reps)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
