"""Executed, timed training steps — the round-3 training perf story (VERDICT
item 4: the round-2 at-scale table was compile-only memory analysis).

Configs:
  standard   bs4 368x496, 12 iters, bf16, materialized volume (the round-2
             headline training config; `train.py:195-234` semantics at the
             reference's Sintel-stage crop scale)
  standard_alt  same with alternate_corr (on-demand Pallas) + remat
  scale768   bs1 768x1408, 12 iters, bf16, alternate_corr + remat — a shape
             whose materialized volume cannot compile (BENCH.md memory table)
  scale1088  bs1 1088x1920, 12 iters, bf16, alternate_corr + remat — only
             trainable configuration at this shape

Timing: K steps dispatched in sequence, state threaded (donated), sync by
materializing the last metrics scalar; reports per-step wall after subtracting
nothing (RTT is one sync per K steps, amortized like bench.py).

Usage: python tools/bench_train.py [--configs standard,scale768] [--k 8]
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

CONFIGS = {
    "standard": dict(batch=4, H=368, W=496, alternate_corr=False, remat=False),
    "standard_alt": dict(batch=4, H=368, W=496, alternate_corr=True, remat=True),
    "scale768": dict(batch=1, H=768, W=1408, alternate_corr=True, remat=True),
    "scale1088": dict(batch=1, H=1088, W=1920, alternate_corr=True, remat=True),
}


def bench_config(name, spec, k, reps):
    from raft_optical_flow_tpu.models import RAFTConfig
    from raft_optical_flow_tpu.train.configs import StageConfig
    from raft_optical_flow_tpu.train.trainer import create_train_state, raft_train_step

    batch, H, W = spec["batch"], spec["H"], spec["W"]
    config = RAFTConfig(
        small=False, compute_dtype=jnp.bfloat16,
        alternate_corr=spec["alternate_corr"], remat=spec["remat"],
    )
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
        loss = float(metrics["loss"])  # one sync per K steps
        times.append((time.perf_counter() - t0) / k)
    ms = float(np.min(times) * 1e3)
    row = {
        "ms_per_step": round(ms, 1),
        "samples_per_sec_chip": round(batch / (ms / 1e3), 2),
        "Mpx_per_sec": round(batch * H * W / (ms / 1e3) / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "final_loss_finite": bool(np.isfinite(loss)),
    }
    print(f"{name:14s} {ms:8.1f} ms/step  {row['samples_per_sec_chip']:6.2f} "
          f"samples/s  {row['Mpx_per_sec']:7.1f} Mpx/s  (compile {compile_s:.0f}s, "
          f"loss finite={row['final_loss_finite']})", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="standard,standard_alt,scale768,scale1088")
    ap.add_argument("--k", type=int, default=8, help="steps per timing dispatch")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    rows = {}
    for name in args.configs.split(","):
        rows[name] = bench_config(name, CONFIGS[name], args.k, args.reps)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
