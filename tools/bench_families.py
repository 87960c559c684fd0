"""Device-time inference benchmarks for ALL model families (round-3 VERDICT
item 3 — the round-2 zoo latencies all sat at the ~30 ms tunnel-RTT floor).

Method: the bench.py multi-pair trick — N independent pairs dispatched in one
jit call via lax.map, so the tunnel round-trip is paid once per dispatch. To
remove the RTT *entirely* from the per-pair number, each model is timed at two
dispatch sizes (N1, N2) and the slope gives pure device time per pair:

    t(N) = RTT + N * t_pair  =>  t_pair = (t(N2) - t(N1)) / (N2 - N1)

Shapes:
  - Sintel full-frame (1024x436-ish, family-appropriate padding) for the
    cross-family table.
  - SimpleFlowNet additionally at 256x256 — the shape of the reference's
    recorded "~10 ms/frame GPU, ~100 ms CPU" (`README_simple_flow.md:118-128`,
    bs8 256^2 training context).
  - RAFT additionally at the true KITTI eval shape 375x1242 through the
    shape-bucketing eval path (`eval/evaluate.py::_run_padded`, stride 64 ->
    384x1280 bucket, iters 24 like `evaluate.py:130-166`) — proves the
    bucketed-eval program compiles and runs on hardware (round-3 VERDICT
    item 7).

Round-4 additions (VERDICT item 5): per-family MFU — achieved model-FLOPs
utilization = XLA cost-analysis FLOPs / (device time x chip peak) — plus the
HBM-bandwidth fraction and a bound label, so every throughput number is
auditable against chip speed-of-light, not only against a derived A100.
Peaks are TPU v5e: 197 TFLOP/s bf16 MXU (fp32 arrays at DEFAULT matmul
precision run the MXU in bf16 passes, so the same peak applies to the fp32
families), 819 GB/s HBM.

Prints a markdown table + one JSON line.
Usage: python tools/bench_families.py [--reps 6]
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

N1, N2 = 4, 16
PEAK_FLOPS = 197e12  # v5e bf16 MXU peak
PEAK_HBM = 819e9     # v5e HBM bytes/s


def cost_of(fwd, variables, shape):
    """(flops, hbm_bytes) of the single-pair forward from XLA cost analysis."""
    a = jnp.zeros((1,) + shape, jnp.float32)
    ca = jax.jit(fwd).lower(variables, a, a).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per executable
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def time_map_fwd(fwd, variables, shape, reps, batched=False):
    """(t_pair_ms, wall_ms_at_N2) for a single-pair fwd(variables, a, b).

    batched=False: lax.map of the batch-1 program — per-pair device time of
    the latency-oriented configuration (rounds 1-3 continuity).
    batched=True: ONE fwd on the [n, ...] batch — the serving configuration
    (bench.py headline methodology); still RTT-free via two-point scaling.
    """
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    results = {}
    for n in (N1, N2):
        a = jax.random.uniform(k1, (n, 1) + shape, jnp.float32, 0, 255)
        b = jax.random.uniform(k2, (n, 1) + shape, jnp.float32, 0, 255)

        @jax.jit
        def run(variables, a, b):
            if batched:
                out = fwd(variables, a[:, 0], b[:, 0])
            else:
                out = jax.lax.map(lambda p: fwd(variables, p[0], p[1]), (a, b))
            return jnp.sum(out)

        float(run(variables, a, b))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(variables, a, b))
            times.append(time.perf_counter() - t0)
        results[n] = np.min(times) * 1e3
    t_pair = (results[N2] - results[N1]) / (N2 - N1)
    return t_pair, results[N2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--only", default="",
                    help="comma list: raft,lfn3,lfn3s,simple,simple256,ifnet")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from raft_optical_flow_tpu.models.ifnet import IFNet
    from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3
    from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig
    from raft_optical_flow_tpu.models.simple_flow import SimpleFlowConfig, SimpleFlowNet
    from raft_optical_flow_tpu.ops.padding import InputPadder

    key = jax.random.PRNGKey(0)
    rows = {}
    print("backend:", jax.default_backend(), flush=True)

    def record(name, t_pair, wall_n2, note="", cost=None, t_batched=None):
        rows[name] = {
            "device_ms_per_pair": round(t_pair, 2),
            "device_pairs_per_sec": round(1e3 / t_pair, 1),
            "wall_ms_per_pair_steady": round(wall_n2 / N2, 2),
            "note": note,
        }
        if t_batched is not None:
            rows[name]["batched_ms_per_pair"] = round(t_batched, 2)
            rows[name]["batched_pairs_per_sec"] = round(1e3 / t_batched, 1)
        extra = ""
        if cost is not None:
            flops, hbm = cost
            mfu = flops / (t_pair * 1e-3 * PEAK_FLOPS)
            hbm_frac = hbm / (t_pair * 1e-3 * PEAK_HBM)
            rows[name].update({
                "gflops": round(flops / 1e9, 1),
                "mfu": round(mfu, 4),
                "hbm_gb": round(hbm / 1e9, 2),
                "hbm_frac": round(hbm_frac, 3),
                "bound": "HBM" if hbm_frac > mfu else "MXU",
            })
            if t_batched is not None:
                rows[name]["batched_mfu"] = round(
                    flops / (t_batched * 1e-3 * PEAK_FLOPS), 4)
            extra = (f"  MFU {mfu * 100:5.1f}%  HBM {hbm_frac * 100:5.1f}%"
                     f" -> {rows[name]['bound']}-bound")
        print(f"{name:24s} {t_pair:8.2f} ms/pair device "
              f"({1e3 / t_pair:7.1f} pairs/s)  wall {wall_n2 / N2:6.1f} ms"
              + extra, flush=True)

    H, W = 436, 1024

    if not only or "raft" in only:
        padder = InputPadder((1, H, W, 3), mode="sintel")
        Hp, Wp = padder.pad(jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)))[0].shape[1:3]
        model = RAFT(RAFTConfig(small=False, compute_dtype=jnp.bfloat16))
        variables = model.init(key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
                               iters=1, test_mode=True)
        fwd32 = lambda v, a, b: model.apply(v, a, b, iters=32, test_mode=True)[1]
        t, w = time_map_fwd(fwd32, variables, (Hp, Wp, 3), args.reps)
        tb, _ = time_map_fwd(fwd32, variables, (Hp, Wp, 3), args.reps, batched=True)
        record(f"raft-standard {Hp}x{Wp} i32", t, w, "bf16 policy",
               cost=cost_of(fwd32, variables, (Hp, Wp, 3)), t_batched=tb)

    if not only or "kitti" in only:
        # true KITTI eval shape through the REAL bucketed-eval path: one
        # _run_padded call (pad to the stride-64 bucket -> fwd -> unpad, the
        # exact validate_kitti program, `evaluate.py:130-166` semantics),
        # then two-point device timing at the bucket shape (iters 24).
        from raft_optical_flow_tpu.eval.evaluate import _run_padded

        model = RAFT(RAFTConfig(small=False, compute_dtype=jnp.bfloat16))
        variables = model.init(key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
                               iters=1, test_mode=True)
        fwd24 = jax.jit(lambda a, b, flow_init=None: model.apply(
            variables, a, b, iters=24, test_mode=True))
        frame = np.random.default_rng(0).uniform(
            0, 255, size=(375, 1242, 3)).astype(np.float32)
        flow, _ = _run_padded(fwd24, frame, frame, mode="kitti", stride=64)
        assert flow.shape == (375, 1242, 2), flow.shape
        kp = InputPadder((1, 375, 1242, 3), mode="kitti", stride=64)
        Hk, Wk = kp.pad(jnp.zeros((1, 375, 1242, 3)),
                        jnp.zeros((1, 375, 1242, 3)))[0].shape[1:3]
        fwd24m = lambda v, a, b: model.apply(v, a, b, iters=24, test_mode=True)[1]
        t, w = time_map_fwd(fwd24m, variables, (Hk, Wk, 3), args.reps)
        record(f"raft-standard kitti 375x1242 (bucket {Hk}x{Wk}) i24", t, w,
               "eval bucketing path, bf16 policy",
               cost=cost_of(fwd24m, variables, (Hk, Wk, 3)))

    # round-5: each non-RAFT family is timed in BOTH precisions — the fp32
    # rows measured 0.9-1.0x HBM speed-of-light in round 4, so the bf16
    # compute_dtype policy (halved activation bytes) is the named lever;
    # fidelity for the bf16 policy is gated in bench.py::fidelity_check_families
    for s_version in (False, True):
        tag = "liteflownet3s" if s_version else "liteflownet3"
        want = "lfn3s" if s_version else "lfn3"
        if not only or want in only:
            variables = LiteFlowNet3(LFN3Config(use_s_version=s_version)).init(
                key, jnp.zeros((1, 2, 64, 64, 3)))
            for dt, dtag in ((jnp.float32, ""), (jnp.bfloat16, " bf16")):
                model = LiteFlowNet3(
                    LFN3Config(use_s_version=s_version, compute_dtype=dt))
                # model API: [B, 2, H, W, 3] in [0,1]; InputScaler resizes /32
                fwd = lambda v, a, b, m=model: m.apply(
                    v, jnp.stack([a, b], 1) / 255.0)["flows"]
                t, w = time_map_fwd(fwd, variables, (H, W, 3), args.reps)
                tb, _ = time_map_fwd(fwd, variables, (H, W, 3), args.reps,
                                     batched=True)
                record(f"{tag}{dtag} {H}x{W}", t, w,
                       cost=cost_of(fwd, variables, (H, W, 3)), t_batched=tb)

    if not only or "simple" in only or "simple256" in only:
        variables = SimpleFlowNet(SimpleFlowConfig()).init(
            key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
        for dt, dtag in ((jnp.float32, ""), (jnp.bfloat16, " bf16")):
            model = SimpleFlowNet(SimpleFlowConfig(compute_dtype=dt))
            sfwd = lambda v, a, b, m=model: m.apply(v, a / 255.0, b / 255.0)[-1]
            if not only or "simple" in only:
                t, w = time_map_fwd(sfwd, variables, (432, 1024, 3), args.reps)
                tb, _ = time_map_fwd(sfwd, variables, (432, 1024, 3), args.reps,
                                     batched=True)
                record(f"simple_flow{dtag} 432x1024", t, w,
                       cost=cost_of(sfwd, variables, (432, 1024, 3)), t_batched=tb)
            if not only or "simple256" in only:
                t, w = time_map_fwd(sfwd, variables, (256, 256, 3), args.reps)
                tb, _ = time_map_fwd(sfwd, variables, (256, 256, 3), args.reps,
                                     batched=True)
                record(f"simple_flow{dtag} 256x256", t, w,
                       "reference: ~10 ms/frame GPU (README_simple_flow.md:122-125)",
                       cost=cost_of(sfwd, variables, (256, 256, 3)), t_batched=tb)

    if not only or "ifnet" in only:
        variables = IFNet().init(
            key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))
        # frw = feature_res_warp serving restructure (warp at block input
        # resolution, round-4 VERDICT item 5); closeness gated by
        # tests/test_simple_ifnet_parity.py::test_ifnet_feature_res_warp_close
        for dt, frw, dtag in ((jnp.float32, False, ""),
                              (jnp.bfloat16, False, " bf16"),
                              (jnp.bfloat16, True, " bf16 frw")):
            model = IFNet(compute_dtype=dt, feature_res_warp=frw)
            ifwd = lambda v, a, b, m=model: m.apply(
                v, a / 255.0, b / 255.0, scale=(4, 2, 1), timestep=0.5)[0][-1]
            t, w = time_map_fwd(ifwd, variables, (432, 1024, 3), args.reps)
            tb, _ = time_map_fwd(ifwd, variables, (432, 1024, 3), args.reps,
                                 batched=True)
            record(f"ifnet{dtag} 432x1024", t, w,
                   cost=cost_of(ifwd, variables, (432, 1024, 3)), t_batched=tb)

    print()
    print("| model | device ms/pair | device pairs/s | batched pairs/s | "
          "GFLOPs | MFU | batched MFU | HBM frac | bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, r in rows.items():
        print(f"| {name} | {r['device_ms_per_pair']} | "
              f"{r['device_pairs_per_sec']} | "
              f"{r.get('batched_pairs_per_sec', '-')} | {r.get('gflops', '-')} | "
              f"{r.get('mfu', '-')} | {r.get('batched_mfu', '-')} | "
              f"{r.get('hbm_frac', '-')} | {r.get('bound', '-')} |")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
