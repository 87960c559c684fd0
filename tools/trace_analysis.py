"""Op-level device-time breakdown from a jax.profiler trace (XSpace proto).

The observability backbone for the perf work: runs a chosen program once under
jax.profiler, parses the written .xplane.pb with the TF profiler protos, and
prints per-op and per-op-class exclusive device self-times for the TPU plane.

Programs (--mode):
  infer      RAFT-standard test-mode forward, 1024x440, 32 iters, bf16
             (single pair; the round-1/2 headline program)
  infer_batched16  same on a [16, 440, 1024, 3] batch — the round-3 batched
             headline dispatch (per-pair numbers = totals / 16)
  train      supervised RAFT-standard train step (fwd+bwd through the Pallas
             custom-VJP kernels + AdamW), bs4 368x496, 12 iters, bf16 —
             `train.py:195-234` semantics
  train_alt  same with alternate_corr (on-demand kernels) + remat
  instnorm   the tools/bench_instnorm.py conv+IN chain (layout-copy hunting)

Usage: python tools/trace_analysis.py --mode train [--top 40]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x) if not isinstance(x, tuple) else sum(jnp.sum(v) for v in jax.tree.leaves(x)))


def build_infer(batch=1):
    from raft_optical_flow_tpu.models import RAFT, RAFTConfig

    model = RAFT(RAFTConfig(small=False, compute_dtype=jnp.bfloat16))
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (batch, 440, 1024, 3), jnp.float32, 0, 255)
    variables = model.init(key, img[:1, :64, :64], img[:1, :64, :64], iters=1, test_mode=True)

    @jax.jit
    def fn(variables, a, b):
        return model.apply(variables, a, b, iters=32, test_mode=True)[1]

    return lambda: _sync(fn(variables, img, img))


def build_train(alternate_corr=False, remat=False, batch=4, H=368, W=496,
                iters=12):
    from raft_optical_flow_tpu.models import RAFTConfig
    from raft_optical_flow_tpu.train.configs import StageConfig
    from raft_optical_flow_tpu.train.trainer import create_train_state, raft_train_step

    config = RAFTConfig(small=False, compute_dtype=jnp.bfloat16,
                        alternate_corr=alternate_corr, remat=remat)
    stage = StageConfig(name="prof", stage="things", num_steps=100,
                        batch_size=batch, lr=1.25e-4, image_size=(H, W))
    key = jax.random.PRNGKey(0)
    state = create_train_state(key, config, stage, (H, W))
    batch_data = {
        "image1": jax.random.uniform(key, (batch, H, W, 3), jnp.float32, 0, 255),
        "image2": jax.random.uniform(key, (batch, H, W, 3), jnp.float32, 0, 255),
        "flow": jax.random.uniform(key, (batch, H, W, 2), jnp.float32, -5, 5),
        "valid": jnp.ones((batch, H, W), jnp.float32),
    }
    step = jax.jit(lambda s, b, r: raft_train_step(
        s, b, r, config=config, iters=iters, freeze_bn=True))

    holder = {"state": state}

    def run():
        new_state, metrics = step(holder["state"], batch_data, key)
        holder["state"] = new_state
        return float(metrics["loss"])

    return run


def build_ifnet(batch=4, frw=False):
    """IFNet forward at Sintel scale, batched so per-pair times rise above the
    profiler noise (per-pair = totals / batch). Chasing the bench_families.py
    anomaly: 34 ms/pair device time at only ~22 GFLOPs — suspected XLA-gather
    cost in the full-resolution warp cascade (`models/ifnet.py:114-115`).
    frw=True traces the feature_res_warp+bf16 serving restructure instead."""
    from raft_optical_flow_tpu.models.ifnet import IFNet

    model = IFNet(compute_dtype=jnp.bfloat16 if frw else jnp.float32,
                  feature_res_warp=frw)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (batch, 432, 1024, 3), jnp.float32)
    variables = model.init(key, img[:1, :64, :64], img[:1, :64, :64])

    @jax.jit
    def fn(variables, a, b):
        flow_list, _, _ = model.apply(variables, a, b)
        return flow_list[-1]

    return lambda: _sync(fn(variables, img, img))


def build_instnorm():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_instnorm import chain, in_reduce

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 220, 512, 64), jnp.bfloat16)
    w1 = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    f = jax.jit(lambda x, w1, w2: jnp.sum(chain(in_reduce, x, w1, w2)))
    return lambda: float(f(x, w1, w2))


def parse_xspace(log_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {log_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace


def _union(intervals):
    intervals.sort()
    total = 0
    cur_s = cur_e = None
    for s, e in intervals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        total += cur_e - cur_s
    return total


def device_op_times(xspace):
    """({op_name: duration ps} for compute lines, compute busy ps, async-DMA
    busy ps) from the TPU device plane(s).

    Async copy-start/done events (VMEM-prefetch and HBM DMAs) live on separate
    trace lines and their durations span the whole async window, overlapping
    compute — summing them alongside compute ops wildly overcounts "copy"
    time. They are tracked only as a busy-union on their own lines.
    """
    per_op = collections.Counter()
    compute_busy = []
    dma_busy = []
    for plane in xspace.planes:
        if "TPU" not in plane.name or "pjrt" in plane.name.lower():
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla modules" in lname:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                span = (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                if ("copy-start" in name or "slice-start" in name
                        or "copy-done" in name or "slice-done" in name):
                    dma_busy.append(span)
                else:
                    per_op[name] += ev.duration_ps
                    compute_busy.append(span)
    return per_op, _union(compute_busy), _union(dma_busy)


def classify(name):
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas custom-call"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "conv" in n:
        return "convolution"
    if "dot" in n:
        return "dot"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n:
        return "collective"
    if "dynamic" in n and "slice" in n:
        return "dynamic-slice"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="train",
                    choices=["infer", "infer_batched16", "train", "train_alt",
                             "instnorm", "ifnet", "ifnet_frw"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--keep", default=None, help="keep trace dir at this path")
    args = ap.parse_args()

    build = {
        "infer": build_infer,
        "infer_batched16": lambda: build_infer(batch=16),
        "train": build_train,
        "train_alt": lambda: build_train(alternate_corr=True, remat=True),
        "instnorm": build_instnorm,
        "ifnet": build_ifnet,
        "ifnet_frw": lambda: build_ifnet(frw=True),
    }[args.mode]
    run = build()
    run()  # compile + warm
    run()

    log_dir = args.keep or tempfile.mkdtemp(prefix="trace_")
    jax.profiler.start_trace(log_dir)
    run()
    jax.profiler.stop_trace()

    xspace = parse_xspace(log_dir)
    per_op, busy_ps, dma_ps = device_op_times(xspace)
    total_ps = sum(per_op.values())
    print(f"\nmode={args.mode}  compute op-time total {total_ps / 1e9:.2f} ms, "
          f"compute busy(union) {busy_ps / 1e9:.2f} ms, "
          f"async-DMA busy(union) {dma_ps / 1e9:.2f} ms")

    by_class = collections.Counter()
    for name, ps in per_op.items():
        by_class[classify(name)] += ps
    print("\n| op class | ms | % |")
    print("|---|---|---|")
    for cls, ps in by_class.most_common():
        print(f"| {cls} | {ps / 1e9:.3f} | {100 * ps / max(total_ps, 1):.1f} |")

    print(f"\ntop {args.top} ops by self time:")
    for name, ps in per_op.most_common(args.top):
        print(f"  {ps / 1e9:9.3f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
