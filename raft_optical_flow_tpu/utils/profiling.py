"""Profiling hooks: jax.profiler traces + per-step timing.

Parity target: the reference's ad-hoc tools — `time_it` with cuda.synchronize
(`uflow_loss_pytorch.py:947-982`) and the `compare_models` latency/params harness
(`IFNET_m.py:373-521`). TPU-native equivalents:

  - `trace(log_dir)`: context manager around jax.profiler (XPlane traces viewable
    in TensorBoard / Perfetto).
  - `time_fn`: wall-clock timing that forces a scalar to host per call —
    `block_until_ready` does NOT reliably block through the axon TPU tunnel
    (measured 500x under-reporting), so scalar materialization is the only
    trustworthy sync on this runtime.
  - `compare_models`: params + latency table across model families.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "profile"):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out) -> float:
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def time_fn(fn: Callable, *args, num_reps: int = 10, warmup: int = 1):
    """Median wall-clock ms per call, synced by scalar materialization."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        _sync(out)
    times = []
    for _ in range(num_reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3), out


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def param_bytes(params) -> int:
    return sum(
        int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
        for x in jax.tree.leaves(params)
    )


def memory_analysis(compiled) -> Dict:
    """Peak-memory columns from a compiled executable (no execution needed).

    The reference's `compare_models` reports model memory + peak GPU memory
    (`IFNET_m.py:373-521`); the XLA-native equivalent is the compiler's memory
    analysis of the lowered executable: temp (activation workspace), argument,
    and output buffer sizes. Returns {} when the backend doesn't expose it.
    """
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return {}
    if ma is None:
        return {}
    out = {}
    for key, attr in (
        ("temp_mb", "temp_size_in_bytes"),
        ("arg_mb", "argument_size_in_bytes"),
        ("output_mb", "output_size_in_bytes"),
    ):
        val = getattr(ma, attr, None)
        if val is not None:
            out[key] = round(float(val) / 2**20, 2)
    if out:
        # Upper bound: buffers overlap in time and donated/aliased args would
        # double-count, so the sum is NOT XLA's true peak — keep it under an
        # honest name and report the compiler's actual peak when exposed.
        out["total_buffers_mb"] = round(sum(out.values()), 2)
    peak = getattr(ma, "peak_memory_in_bytes", None)
    if peak:
        out["peak_hbm_mb"] = round(float(peak) / 2**20, 2)
    return out


def compare_models(height: int = 256, width: int = 448, num_reps: int = 5) -> Dict:
    """Params + latency across the model zoo (`IFNET_m.py:373-521` role)."""
    results = {}
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, height, width, 3), jnp.float32, 0, 255)

    from raft_optical_flow_tpu.models.ifnet import IFNet
    from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3
    from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig
    from raft_optical_flow_tpu.models.simple_flow import SimpleFlowConfig, SimpleFlowNet

    def bench(name, model, fwd, init_fn):
        variables = init_fn()
        f = jax.jit(lambda a, b: fwd(variables, a, b))
        ms, _ = time_fn(f, img, img, num_reps=num_reps)
        entry = {
            "params": param_count(variables["params"]),
            "model_mb": round(param_bytes(variables["params"]) / 2**20, 2),
            "latency_ms": round(ms, 2),
        }
        try:  # XLA cost analysis = the thop-FLOPs role (`IFNET_m.py:373-521`)
            compiled = f.lower(img, img).compile()
            ca = compiled.cost_analysis()
            if ca and "flops" in ca:
                entry["gflops"] = round(float(ca["flops"]) / 1e9, 2)
            entry.update(memory_analysis(compiled))
        except Exception:
            pass
        results[name] = entry

    raft = RAFT(RAFTConfig(small=True))
    bench(
        "raft-small", raft,
        lambda v, a, b: raft.apply(v, a, b, iters=12, test_mode=True)[1],
        lambda: raft.init(key, img, img, iters=1, test_mode=True),
    )
    lfn3s = LiteFlowNet3(LFN3Config(use_s_version=True))
    bench(
        "liteflownet3s", lfn3s,
        lambda v, a, b: lfn3s.apply(v, jnp.stack([a, b], 1) / 255.0)["flows"],
        lambda: lfn3s.init(key, jnp.stack([img, img], 1) / 255.0),
    )
    sfn = SimpleFlowNet(SimpleFlowConfig())
    bench(
        "simple_flow", sfn,
        lambda v, a, b: sfn.apply(v, a / 255.0, b / 255.0)[-1],
        lambda: sfn.init(key, img / 255.0, img / 255.0),
    )
    ifn = IFNet()
    bench(
        "ifnet", ifn,
        lambda v, a, b: ifn.apply(v, a / 255.0, b / 255.0)[0][-1],
        lambda: ifn.init(key, img / 255.0, img / 255.0),
    )
    return results


if __name__ == "__main__":
    import json

    print(json.dumps(compare_models(), indent=2))
