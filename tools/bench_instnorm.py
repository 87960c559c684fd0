"""Microbench: instance-norm stats formulations inside a conv chain (round-3
VERDICT item 2 — reclaim the ~3 ms of XLA reduce-layout copies in fnet).

Compares, in a jitted conv+IN+relu chain shaped like fnet's stages at Sintel
size, per-call wall time of:
  - reduce: current formulation (mean/mean_sq via jnp reduces over (1, 2))
  - matmul: stats via a dot_general contraction over the flattened spatial dim
    (ones-vector matvec keeps the NHWC layout; no transpose copies)
Timing through the tunnel is floored at ~30 ms RTT, so the chain is looped
REPS times inside one dispatch and the per-rep delta is what matters.

Usage: python tools/bench_instnorm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def in_reduce(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    mean_sq = (x32 * x32).mean(axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


def in_matmul(x, eps=1e-5):
    B, H, W, C = x.shape
    x32 = x.astype(jnp.float32).reshape(B, H * W, C)
    ones = jnp.ones((H * W,), jnp.float32)
    mean = jnp.einsum("bsc,s->bc", x32, ones) / (H * W)
    mean_sq = jnp.einsum("bsc,s->bc", x32 * x32, ones) / (H * W)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)[:, None, None, :]
    mean = mean[:, None, None, :]
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


def in_matmul_onepass(x, eps=1e-5):
    # single contraction over [x, x*x] stacked on the channel dim
    B, H, W, C = x.shape
    x32 = x.astype(jnp.float32).reshape(B, H * W, C)
    both = jnp.concatenate([x32, x32 * x32], axis=-1)
    ones = jnp.ones((H * W,), jnp.float32)
    stats = jnp.einsum("bsc,s->bc", both, ones) / (H * W)
    mean, mean_sq = stats[:, :C], stats[:, C:]
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)[:, None, None, :]
    mean = mean[:, None, None, :]
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


def chain(norm, x, w1, w2):
    def body(h, _):
        h = jax.lax.conv_general_dilated(
            h, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        h = norm(h)
        h = jax.nn.relu(h)
        h = jax.lax.conv_general_dilated(
            h, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        h = norm(h)
        h = jax.nn.relu(h)
        return h, ()

    out, _ = jax.lax.scan(body, x, None, length=REPS)
    return out


def bench(name, norm, x, w1, w2):
    f = jax.jit(lambda x, w1, w2: jnp.sum(chain(norm, x, w1, w2)))
    float(f(x, w1, w2))  # compile
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(f(x, w1, w2))
        times.append(time.perf_counter() - t0)
    ms = np.min(times) * 1e3
    print(f"{name:16s} {ms:8.2f} ms total  {ms / REPS:6.3f} ms/rep")
    return ms


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    # fnet stage-1 shape at padded Sintel size: [2, 220, 512, 64] bf16
    for dtype in (jnp.bfloat16, jnp.float32):
        print(f"\n-- dtype {dtype.__name__}, [2, 220, 512, 64] --")
        x = jax.random.normal(key, (2, 220, 512, 64), dtype)
        w1 = jax.random.normal(key, (3, 3, 64, 64), dtype) * 0.05
        w2 = jax.random.normal(key, (3, 3, 64, 64), dtype) * 0.05
        base = bench("reduce (curr)", in_reduce, x, w1, w2)
        bench("matmul 2-pass", in_matmul, x, w1, w2)
        bench("matmul 1-pass", in_matmul_onepass, x, w1, w2)


if __name__ == "__main__":
    main()
