"""Batched-apply vs lax.map dispatch for the headline RAFT throughput.

bench.py amortizes the tunnel RTT by mapping the single-pair forward over N
pairs with lax.map — sequential per-pair execution, so every conv in the
update block runs at [1, 55, 128, C] spatial extent (~70% MXU efficiency,
BENCH.md trace). A TRUE batched apply ([N, H, W, 3] in one call) multiplies
the conv/matmul row count by N, which is exactly what the MXU wants; with
alternate_corr the correlation memory stays O(query tile) so even N=16 fits
easily. This tool measures pairs/s for both dispatch styles across N and
corr paths to pick the headline config.

Usage: python tools/bench_batched_dispatch.py [--reps 5]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    from raft_optical_flow_tpu.models import RAFT, RAFTConfig
    from raft_optical_flow_tpu.ops.padding import InputPadder

    H, W = 436, 1024
    padder = InputPadder((1, H, W, 3), mode="sintel")
    Hp, Wp = padder.pad(jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)))[0].shape[1:3]
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    print(f"backend: {jax.default_backend()}  padded {Hp}x{Wp}", flush=True)

    results = {}
    for alt in (False, True):
        model = RAFT(RAFTConfig(small=False, compute_dtype=jnp.bfloat16,
                                alternate_corr=alt))
        variables = model.init(key, jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 64, 64, 3)), iters=1, test_mode=True)

        def fwd(v, a, b):
            return model.apply(v, a, b, iters=args.iters, test_mode=True)[1]

        for style in ("map", "batched"):
            for n in (4, 8, 16):
                a = jax.random.uniform(k1, (n, Hp, Wp, 3), jnp.float32, 0, 255)
                b = jax.random.uniform(k2, (n, Hp, Wp, 3), jnp.float32, 0, 255)
                if style == "map":
                    run = jax.jit(lambda v, a, b: jnp.sum(jax.lax.map(
                        lambda p: fwd(v, p[0][None], p[1][None]), (a, b))))
                else:
                    run = jax.jit(lambda v, a, b: jnp.sum(fwd(v, a, b)))
                tag = f"{'alt' if alt else 'mat'}_{style}_n{n}"
                try:
                    float(run(variables, a, b))  # compile + warm
                except Exception as e:  # noqa: BLE001 - record and continue
                    print(f"{tag:20s} FAILED: {str(e)[:120]}", flush=True)
                    results[tag] = {"error": str(e)[:200]}
                    continue
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(run(variables, a, b))
                    times.append(time.perf_counter() - t0)
                wall = np.min(times)
                pps = n / wall
                results[tag] = {"pairs_per_sec": round(pps, 2),
                                "wall_ms_per_pair": round(wall * 1e3 / n, 2)}
                print(f"{tag:20s} {pps:7.2f} pairs/s  {wall*1e3/n:6.1f} ms/pair",
                      flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
