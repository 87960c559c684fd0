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


def git_stamp():
    """Exact tree the numbers were measured on (commit + dirty flag), so the
    JSON artifact substantiates WHICH code ran (round-4 advisor finding: a
    capture recorded before the snapshot commit can't be tied to the shipped
    tree by git history alone)."""
    import subprocess

    try:
        repo = os.path.dirname(os.path.abspath(__file__))
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=repo,
                             capture_output=True, text=True).stdout.strip()
        dirty = subprocess.run(["git", "status", "--porcelain"], cwd=repo,
                               capture_output=True, text=True).stdout.strip()
        return (rev + ("-dirty" if dirty else "")) or None
    except Exception:
        return None


def fidelity_check():
    """EPE delta vs the torch golden for EVERY kernel path, on this backend.

    The automated Mosaic-regression gate (round-3 VERDICT item 5): each compiled
    path the framework ships — materialized volume + Pallas lookup, on-demand
    Pallas resident mode, on-demand streaming mode (forced via the VMEM budget
    knob), and the bf16 end-to-end policy — is run on the golden crop and its
    (mean, max) EPE delta recorded. A regression in any kernel fails the bench
    run instead of shipping silently. Guards `alt_cuda_corr` parity
    (`/root/reference/alt_cuda_corr/correlation_kernel.cu:19-119`).

    Returns {path: {mean, max, ok}} or None when fixtures are missing.
    """
    import numpy as np

    from raft_optical_flow_tpu.kernels import corr_ondemand_pallas as cop
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
    iters = int(g["iters"])

    def run(config):
        model = RAFT(config)
        _, flow_up = jax.jit(
            lambda v, a, b: model.apply(v, a, b, iters=iters, test_mode=True)
        )(variables, img1, img2)
        epe = np.linalg.norm(
            np.asarray(flow_up, np.float32) - g["flow_up"], axis=-1
        )
        return float(epe.mean()), float(epe.max())

    # budget: fp32 paths < 0.01 px mean (BASELINE.json parity bar); the bf16
    # policy trades precision for speed — 0.02 px mean bound (measured 0.0086)
    paths = {
        "lookup_fp32": (RAFTConfig(small=True), 0.01),
        "ondemand_resident_fp32": (
            RAFTConfig(small=True, alternate_corr=True), 0.01),
        "bf16_policy": (
            RAFTConfig(small=True, compute_dtype=jnp.bfloat16), 0.02),
    }
    results = {}
    for name, (config, budget) in paths.items():
        mean, mx = run(config)
        results[name] = {"mean": round(mean, 5), "max": round(mx, 4),
                         "ok": bool(mean < budget)}

    # streaming mode: shrink the VMEM residency budget so every level takes the
    # h-chunked kernels even at golden-crop size
    saved = cop._RESIDENT_BUDGET
    try:
        cop._RESIDENT_BUDGET = 1  # force h-streaming on all levels
        mean, mx = run(RAFTConfig(small=True, alternate_corr=True))
    finally:
        cop._RESIDENT_BUDGET = saved
    results["ondemand_streaming_fp32"] = {
        "mean": round(mean, 5), "max": round(mx, 4), "ok": bool(mean < 0.01)}

    # batched dispatch: the headline number is measured on a [16,...] batched
    # apply while the rows above run batch-1 — replicate the golden pair x4
    # and assert every batch row still matches (batching must be
    # fidelity-neutral, not just fast)
    model = RAFT(RAFTConfig(small=True))
    _, flow_b = jax.jit(
        lambda v, a, b: model.apply(v, a, b, iters=iters, test_mode=True)
    )(variables, jnp.tile(img1, (4, 1, 1, 1)), jnp.tile(img2, (4, 1, 1, 1)))
    epe_b = np.linalg.norm(
        np.asarray(flow_b, np.float32) - g["flow_up"][None], axis=-1
    )
    results["lookup_fp32_batched4"] = {
        "mean": round(float(epe_b.mean()), 5),
        "max": round(float(epe_b.max()), 4),
        "ok": bool(epe_b.mean() < 0.01),
    }
    return results


def fidelity_check_families():
    """bf16-policy fidelity rows for the non-RAFT families + the LFN3
    batch-16 serving-shape compile gate (round-4 VERDICT items 3/7).

    Each family runs its golden fixture under compute_dtype=bf16 on this
    backend and must stay within a bf16-rounding budget of the fp32 golden
    (budgets derive from the CPU-measured deltas x4 hardware slack; a wrong
    cast/policy bug shows up orders of magnitude above them). The serving
    gate compiles ONE fp32 LiteFlowNet3 forward on [16, 436, 1024] — the
    batched layout-propagation path that RESOURCE_EXHAUSTED'd before the
    spatial_corr placement-matmul fix — so that compile-class regression
    fails the driver capture instead of shipping.

    Returns {name: {mean, max, ok}} or None when fixtures are missing.
    """
    import numpy as np

    from raft_optical_flow_tpu.models.ifnet import IFNet
    from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3
    from raft_optical_flow_tpu.models.simple_flow import (
        SimpleFlowConfig,
        SimpleFlowNet,
    )
    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    repo = os.path.dirname(os.path.abspath(__file__))
    goldens = os.path.join(repo, "tests", "goldens")
    needed = ["lfn3_standard", "simple_flow", "ifnet"]
    if not all(
        os.path.exists(os.path.join(goldens, f"{n}{s}.npz"))
        for n in needed for s in ("", "_params")
    ):
        return None

    def load(name):
        g = np.load(os.path.join(goldens, f"{name}.npz"))
        variables = jax.tree.map(
            jnp.asarray,
            load_flax_checkpoint(os.path.join(goldens, f"{name}_params.npz")),
        )
        return g, variables

    results = {}

    g, variables = load("lfn3_standard")
    images = jnp.asarray(g["images"], jnp.float32).transpose(0, 1, 3, 4, 2)
    model = LiteFlowNet3(LFN3Config(compute_dtype=jnp.bfloat16))
    flows = jax.jit(lambda v, x: model.apply(v, x)["flows"])(variables, images)
    d = np.abs(np.asarray(flows, np.float32).transpose(0, 1, 4, 2, 3) - g["flows"])
    results["lfn3_bf16"] = {
        "mean": round(float(d.mean()), 5), "max": round(float(d.max()), 4),
        "ok": bool(d.mean() < 0.02)}

    g, variables = load("simple_flow")
    i1 = jnp.asarray(g["img1"], jnp.float32).transpose(0, 2, 3, 1)
    i2 = jnp.asarray(g["img2"], jnp.float32).transpose(0, 2, 3, 1)
    smodel = SimpleFlowNet(SimpleFlowConfig(compute_dtype=jnp.bfloat16))
    pred = jax.jit(lambda v, a, b: smodel.apply(v, a, b)[-1])(variables, i1, i2)
    d = np.abs(np.asarray(pred, np.float32).transpose(0, 3, 1, 2) - g["flow_2"])
    results["simple_flow_bf16"] = {
        "mean": round(float(d.mean()), 5), "max": round(float(d.max()), 4),
        "ok": bool(d.mean() < 0.08)}  # x20-scaled flow units

    g, variables = load("ifnet")
    i0 = jnp.asarray(g["img0"], jnp.float32).transpose(0, 2, 3, 1)
    i1 = jnp.asarray(g["img1"], jnp.float32).transpose(0, 2, 3, 1)
    imodel = IFNet(compute_dtype=jnp.bfloat16)
    flow = jax.jit(
        lambda v, a, b: imodel.apply(v, a, b, scale=(4, 2, 1), timestep=0.5)[0][-1]
    )(variables, i0, i1)
    d = np.abs(np.asarray(flow, np.float32).transpose(0, 3, 1, 2) - g["flow_2"])
    results["ifnet_bf16"] = {
        "mean": round(float(d.mean()), 5), "max": round(float(d.max()), 4),
        "ok": bool(d.mean() < 0.02)}

    # the feature_res_warp serving restructure (warp at block input res):
    # budget = bf16 rounding + the measured ~0.023 warp-commute delta
    fmodel = IFNet(compute_dtype=jnp.bfloat16, feature_res_warp=True)
    flow = jax.jit(
        lambda v, a, b: fmodel.apply(v, a, b, scale=(4, 2, 1), timestep=0.5)[0][-1]
    )(variables, i0, i1)
    d = np.abs(np.asarray(flow, np.float32).transpose(0, 3, 1, 2) - g["flow_2"])
    results["ifnet_bf16_frw"] = {
        "mean": round(float(d.mean()), 5), "max": round(float(d.max()), 4),
        "ok": bool(d.mean() < 0.06)}

    # LFN3 batch-16 serving-shape compile gate (fp32 — the risky layout path).
    # TPU only: the point is the hardware layout-assignment path, and the
    # 16 x 436 x 1024 program is pointlessly slow on a CPU host.
    if jax.default_backend() != "cpu":
        _, variables = load("lfn3_standard")
        serve = LiteFlowNet3(LFN3Config())
        x = jax.random.uniform(
            jax.random.PRNGKey(0), (16, 2, 436, 1024, 3), jnp.float32)
        out = jax.jit(lambda v, x: serve.apply(v, x)["flows"])(variables, x)
        finite = bool(jnp.isfinite(jnp.sum(out)))
        results["lfn3_serving_batch16_compile"] = {
            "mean": 0.0, "max": 0.0, "ok": finite}
    return results


def fidelity_check_fullres():
    """One FULL-RESOLUTION demo-frame pair vs the torch golden, on this backend.

    The crop-level gate above can miss shape-dependent Mosaic regressions
    (tiling/grid logic changes with H, W); this runs raft-small at the real
    1024x436 Sintel shape (pair 0 of tests/goldens/fullres, iters=32) under
    fp32-faithful matmul precision — the same setting the golden was verified
    at (tools/verify_fullres_tpu.py, BENCH.md "Dataset-scale fidelity").

    Returns {mean, max, ok} or None when fixtures/frames are missing.
    """
    import numpy as np

    from raft_optical_flow_tpu.models import RAFT, RAFTConfig
    from raft_optical_flow_tpu.ops.padding import InputPadder
    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    repo = os.path.dirname(os.path.abspath(__file__))
    golden_path = os.path.join(repo, "tests", "goldens", "fullres",
                               "raft_small_fullres.npz")
    ckpt_path = os.path.join(repo, "checkpoints", "raft_small.npz")
    frames_dir = "/root/reference/demo-frames"
    if not (os.path.exists(golden_path) and os.path.exists(ckpt_path)
            and os.path.isdir(frames_dir)):
        return None
    from PIL import Image

    names = sorted(f for f in os.listdir(frames_dir) if f.endswith(".png"))[:2]
    if len(names) < 2:
        return None
    f1, f2 = (
        np.array(Image.open(os.path.join(frames_dir, n))).astype(np.float32)
        for n in names
    )
    g = np.load(golden_path)
    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(ckpt_path))
    model = RAFT(RAFTConfig(small=True))
    padder = InputPadder((1,) + f1.shape, mode="sintel")
    i1, i2 = padder.pad(jnp.asarray(f1)[None], jnp.asarray(f2)[None])
    with jax.default_matmul_precision("highest"):
        _, flow_up = jax.jit(
            lambda v, a, b: model.apply(v, a, b, iters=32, test_mode=True)
        )(variables, i1, i2)
    ours = np.asarray(padder.unpad(flow_up), np.float32)[0]
    epe = np.linalg.norm(ours - g["flows_up32"][0], axis=-1)
    return {"mean": round(float(epe.mean()), 5),
            "max": round(float(epe.max()), 4),
            "ok": bool(epe.mean() < 0.01)}


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

    # Steady-state throughput: PAIRS_PER_DISPATCH frame pairs per dispatch,
    # which amortizes this environment's ~30 ms tunnel round-trip. Two dispatch
    # styles (tools/bench_batched_dispatch.py, round 3):
    #   batched    one model.apply on [N, H, W, 3] — every conv/matmul gets N x
    #              the rows, which is exactly what the MXU wants (36.7 pairs/s
    #              measured vs 26.8 sequential). The serving configuration; a
    #              GPU server batches for throughput the same way.
    #   sequential lax.map of the batch-1 program — per-pair device time,
    #              reported alongside for continuity with rounds 1-2 and for
    #              the latency-oriented reading of the baseline.
    PAIRS_PER_DISPATCH = 16
    a = jax.random.uniform(k1, (PAIRS_PER_DISPATCH, Hp, Wp, 3), jnp.float32, 0, 255)
    b = jax.random.uniform(k2, (PAIRS_PER_DISPATCH, Hp, Wp, 3), jnp.float32, 0, 255)

    @jax.jit
    def fwd_batched(variables, xs, ys):
        flows = model.apply(variables, xs, ys, iters=32, test_mode=True)[1]
        # the sync scalar is computed inside the same dispatch: a separate
        # jnp.sum dispatch would pay one more tunnel round-trip per timing
        return flows, jnp.sum(flows)

    @jax.jit
    def fwd_sequential(variables, xs, ys):
        flows = jax.lax.map(
            lambda p: model.apply(variables, p[0][None], p[1][None],
                                  iters=32, test_mode=True)[1],
            (xs, ys),
        )
        return flows, jnp.sum(flows)

    def time_fn(fn, n_iters=6):
        # jax.block_until_ready does NOT reliably block through the axon TPU
        # tunnel (measured 500x under-reporting); forcing a scalar to host is
        # the only trustworthy sync.
        float(fn(variables, a, b)[1])  # compile + warmup
        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            float(fn(variables, a, b)[1])
            times.append(time.perf_counter() - t0)
        return min(times)

    pairs_per_sec = PAIRS_PER_DISPATCH / time_fn(fwd_batched)
    seq_pairs_per_sec = PAIRS_PER_DISPATCH / time_fn(fwd_sequential)

    fidelity = fidelity_check()
    fullres = fidelity_check_fullres()
    try:
        families = fidelity_check_families()
    except Exception as e:  # a compile regression (e.g. RESOURCE_EXHAUSTED) lands here
        families = {"error": {"mean": float("inf"), "max": float("inf"),
                              "ok": False, "exc": type(e).__name__}}
    try:
        from raft_optical_flow_tpu.utils.grad_parity import run_all as grad_parity

        grads = grad_parity()
    except Exception as e:  # a Mosaic rejection in a backward kernel lands here
        grads = {"error": {"max_rel": float("inf"), "ok": False,
                           "exc": type(e).__name__}}
    record = {
        "git_rev": git_stamp(),
        "metric": "sintel_1024x436_pairs_per_sec_per_chip_32iters",
        "value": round(pairs_per_sec, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 4),
        "dispatch": f"batched{PAIRS_PER_DISPATCH}",
        "sequential_pairs_per_sec": round(seq_pairs_per_sec, 4),
        "sequential_vs_baseline": round(
            seq_pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 4),
    }
    if fidelity is not None:
        record["fidelity_mean_epe_delta_px"] = fidelity["lookup_fp32"]["mean"]
        record["fidelity_paths"] = fidelity
        if fullres is not None:
            record["fidelity_fullres_1024x436"] = fullres
        if families is not None:
            record["fidelity_families_bf16"] = families
        record["grad_parity_paths"] = grads
        record["fidelity_ok"] = (
            all(v["ok"] for v in fidelity.values())
            and (fullres is None or fullres["ok"])
            and (families is None or all(v["ok"] for v in families.values()))
            and all(v["ok"] for v in grads.values())
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
