"""Headline benchmark: Sintel-resolution RAFT inference throughput on one TPU chip.

Metric (BASELINE.json): Sintel 1024x436 flow pairs/sec/chip at 32 GRU iterations,
RAFT standard model, test mode (flow_low + convex-upsampled flow_up).

vs_baseline uses a derived A100 reference of 13.0 pairs/s (paper 10 pairs/s on a
1080Ti at 12 iters, x3.0 A100 uplift, /2.296 measured 12->32-iteration scaling —
full derivation in BASELINE.md "A100 baseline derivation"; BASELINE.json target
is >=2x).

The JSON line also reports `fidelity_mean_epe_delta_px`: mean EPE delta of
raft-small (converted bundled checkpoint) vs the torch golden fixture, computed
ON THIS BACKEND through the same compiled Pallas kernels the throughput number
exercises — a regression in the Mosaic path fails here, not silently.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "default")

import jax
import jax.numpy as jnp

A100_BASELINE_PAIRS_PER_SEC = 13.0  # derivation: BASELINE.md "A100 baseline derivation"


def fidelity_check():
    """Mean EPE delta vs the torch golden, run on the current backend."""
    import numpy as np

    from raft_optical_flow_tpu.models import RAFT, RAFTConfig
    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    repo = os.path.dirname(os.path.abspath(__file__))
    golden_path = os.path.join(repo, "tests", "goldens", "raft_small.npz")
    ckpt_path = os.path.join(repo, "checkpoints", "raft_small.npz")
    if not (os.path.exists(golden_path) and os.path.exists(ckpt_path)):
        return None
    g = np.load(golden_path)
    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(ckpt_path))
    img1 = jnp.asarray(g["image1"], jnp.float32)[None]
    img2 = jnp.asarray(g["image2"], jnp.float32)[None]
    model = RAFT(RAFTConfig(small=True))
    _, flow_up = jax.jit(
        lambda v, a, b: model.apply(v, a, b, iters=int(g["iters"]), test_mode=True)
    )(variables, img1, img2)
    epe = np.linalg.norm(np.asarray(flow_up) - g["flow_up"], axis=-1)
    return float(epe.mean())


def main():
    from raft_optical_flow_tpu.models import RAFT, RAFTConfig
    from raft_optical_flow_tpu.ops.padding import InputPadder

    # bf16 compute for the conv/GRU stacks; correlation stays fp32 (reference keeps
    # corr in fp32 too, core/raft.py:181-182).
    config = RAFTConfig(small=False, compute_dtype=jnp.bfloat16)
    model = RAFT(config)

    H, W = 436, 1024
    padder = InputPadder((1, H, W, 3), mode="sintel")
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    img1, img2 = padder.pad(img, img)

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    Hp, Wp = img1.shape[1:3]

    variables = model.init(jax.random.PRNGKey(0), img1[:, :64, :64], img1[:, :64, :64],
                           iters=1, test_mode=True)

    # Steady-state throughput: PAIRS_PER_DISPATCH frame pairs processed
    # sequentially on-device per dispatch (lax.map), which amortizes this
    # environment's ~30 ms tunnel round-trip per dispatch. Each pair still runs
    # the full single-pair program (batch=1, 32 iterations).
    PAIRS_PER_DISPATCH = 16
    a = jax.random.uniform(k1, (PAIRS_PER_DISPATCH, 1, Hp, Wp, 3), jnp.float32, 0, 255)
    b = jax.random.uniform(k2, (PAIRS_PER_DISPATCH, 1, Hp, Wp, 3), jnp.float32, 0, 255)

    @jax.jit
    def fwd(variables, xs, ys):
        flows = jax.lax.map(
            lambda p: model.apply(variables, p[0], p[1], iters=32, test_mode=True)[1],
            (xs, ys),
        )
        # the sync scalar is computed inside the same dispatch: a separate
        # jnp.sum dispatch would pay one more tunnel round-trip per timing
        return flows, jnp.sum(flows)

    def run_once():
        # jax.block_until_ready does NOT reliably block through the axon TPU
        # tunnel (measured 500x under-reporting); forcing a scalar to host is
        # the only trustworthy sync.
        _, s = fwd(variables, a, b)
        return float(s)

    run_once()  # compile + warmup

    n_iters = 6
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pairs_per_sec = PAIRS_PER_DISPATCH / dt

    delta = fidelity_check()
    record = {
        "metric": "sintel_1024x436_pairs_per_sec_per_chip_32iters",
        "value": round(pairs_per_sec, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 4),
    }
    if delta is not None:
        record["fidelity_mean_epe_delta_px"] = round(delta, 5)
        record["fidelity_ok"] = bool(delta < 0.01)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
