"""On-chip dataset-scale fidelity verification against the full-res goldens.

Runs every model family ON THE CURRENT BACKEND (intended: the real TPU, through
the same compiled Pallas kernels the headline benchmark exercises) over the
full-resolution golden fixtures (tools/make_goldens_fullres.py) and prints the
per-family EPE-delta table recorded in BENCH.md:

  - RAFT small (bundled checkpoint, real frames): all 9 demo pairs at 1024x436,
    iters 8 and 32, plus the warm-start sequence (`evaluate.py:21-50` semantics:
    flow_init chained through forward_interpolate).
  - LiteFlowNet3 / SimpleFlowNet / IFNet at full resolution (seeded-weight
    goldens, same fixtures layout as the crop-level parity tests).

Pass --alt to also run RAFT through the on-demand (alternate_corr) Pallas path.
Usage: python tools/verify_fullres_tpu.py [--alt]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
GOLDENS = os.path.join(REPO, "tests", "goldens")
FULLRES = os.path.join(GOLDENS, "fullres")
REFERENCE = "/root/reference"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Fidelity runs are fp32-faithful: pin un-annotated matmuls/convs to fp32 passes
# (perf numbers come from bench.py, which uses the models' own precision policy).
jax.config.update("jax_default_matmul_precision", "highest")

from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint  # noqa: E402


def _frames():
    from PIL import Image

    frames_dir = os.path.join(REFERENCE, "demo-frames")
    names = sorted(f for f in os.listdir(frames_dir) if f.endswith(".png"))
    return [
        np.array(Image.open(os.path.join(frames_dir, n))).astype(np.float32)
        for n in names
    ]


def _epe(ours: np.ndarray, golden: np.ndarray):
    d = np.linalg.norm(ours.astype(np.float32) - golden.astype(np.float32), axis=-1)
    return float(d.mean()), float(d.max())


def verify_raft(alternate_corr: bool = False):
    from raft_optical_flow_tpu.eval.evaluate import forward_interpolate
    from raft_optical_flow_tpu.models import RAFT, RAFTConfig
    from raft_optical_flow_tpu.ops.padding import InputPadder

    g = np.load(os.path.join(FULLRES, "raft_small_fullres.npz"))
    variables = jax.tree.map(
        jnp.asarray,
        load_flax_checkpoint(os.path.join(REPO, "checkpoints", "raft_small.npz")),
    )
    model = RAFT(RAFTConfig(small=True, alternate_corr=alternate_corr))
    frames = _frames()
    pairs = list(zip(frames[:-1], frames[1:]))
    padder = InputPadder((1,) + frames[0].shape, mode="sintel")

    fwd = {
        iters: jax.jit(
            lambda v, a, b, flow_init=None, it=iters: model.apply(
                v, a, b, iters=it, flow_init=flow_init, test_mode=True
            )
        )
        for iters in (8, 32)
    }
    results = {}
    tag = "raft-small(alt)" if alternate_corr else "raft-small"

    for iters in (8, 32):
        deltas = []
        for i, (f1, f2) in enumerate(pairs):
            i1, i2 = padder.pad(jnp.asarray(f1)[None], jnp.asarray(f2)[None])
            _, flow_up = fwd[iters](variables, i1, i2)
            ours = np.asarray(padder.unpad(flow_up))[0]
            deltas.append(_epe(ours, g[f"flows_up{iters}"][i]))
        mean = float(np.mean([d[0] for d in deltas]))
        mx = float(np.max([d[1] for d in deltas]))
        results[f"{tag} iters={iters} (9 pairs)"] = (mean, mx)

    # warm-start sequence (`evaluate.py:21-50`)
    warm = jax.jit(
        lambda v, a, b, fi: model.apply(
            v, a, b, iters=32, flow_init=fi, test_mode=True
        )
    )
    l, r, t, b = padder._pad
    h8, w8 = (padder.ht + t + b) // 8, (padder.wd + l + r) // 8
    flow_prev = jnp.zeros((1, h8, w8, 2), jnp.float32)
    first = True
    deltas = []
    for i, (f1, f2) in enumerate(pairs):
        i1, i2 = padder.pad(jnp.asarray(f1)[None], jnp.asarray(f2)[None])
        if first:
            flow_low, flow_up = fwd[32](variables, i1, i2)
            first = False
        else:
            flow_low, flow_up = warm(variables, i1, i2, flow_prev)
        ours = np.asarray(padder.unpad(flow_up))[0]
        deltas.append(_epe(ours, g["flows_warm32"][i]))
        flow_prev = jnp.asarray(forward_interpolate(np.asarray(flow_low)[0]))[None]
    mean = float(np.mean([d[0] for d in deltas]))
    mx = float(np.max([d[1] for d in deltas]))
    results[f"{tag} warm-start iters=32 (sequence)"] = (mean, mx)
    return results


def verify_lfn3(bf16: bool = False):
    from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3

    g = np.load(os.path.join(FULLRES, "lfn3_fullres.npz"))
    variables = jax.tree.map(
        jnp.asarray,
        load_flax_checkpoint(os.path.join(GOLDENS, "lfn3_standard_params.npz")),
    )
    frames = _frames()
    images = jnp.asarray(np.stack([frames[0], frames[1]])[None] / 255.0, jnp.float32)
    cfg = LFN3Config(compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    tag = " bf16" if bf16 else ""
    # bf16 rows run at the true serving precision (no HIGHEST pin)
    prec = "default" if bf16 else "highest"
    with jax.default_matmul_precision(prec):
        out = jax.jit(lambda v, x: LiteFlowNet3(cfg).apply(v, x)["flows"])(
            variables, images
        )
    ours = np.asarray(out)[:, 0]  # [B, H, W, 2]
    golden = g["flows"][:, 0].transpose(0, 2, 3, 1)
    return {f"liteflownet3{tag} 1024x436": _epe(ours, golden)}


def verify_simple_ifnet(bf16: bool = False):
    from raft_optical_flow_tpu.models.ifnet import IFNet
    from raft_optical_flow_tpu.models.simple_flow import SimpleFlowConfig, SimpleFlowNet

    frames = _frames()
    f0 = jnp.asarray(frames[0][:432] / 255.0, jnp.float32)[None]
    f1 = jnp.asarray(frames[1][:432] / 255.0, jnp.float32)[None]
    results = {}
    dt = jnp.bfloat16 if bf16 else jnp.float32
    tag = " bf16" if bf16 else ""
    prec = "default" if bf16 else "highest"  # serving precision for bf16 rows

    g = np.load(os.path.join(FULLRES, "simple_flow_fullres.npz"))
    variables = jax.tree.map(
        jnp.asarray,
        load_flax_checkpoint(os.path.join(GOLDENS, "simple_flow_params.npz")),
    )
    with jax.default_matmul_precision(prec):
        preds = jax.jit(
            lambda v, a, b: SimpleFlowNet(
                SimpleFlowConfig(compute_dtype=dt)).apply(v, a, b)[-1]
        )(variables, f0, f1)
    results[f"simple_flow{tag} 1024x432"] = _epe(
        np.asarray(preds), g["flow"].transpose(0, 2, 3, 1)
    )

    g = np.load(os.path.join(FULLRES, "ifnet_fullres.npz"))
    variables = jax.tree.map(
        jnp.asarray, load_flax_checkpoint(os.path.join(GOLDENS, "ifnet_params.npz"))
    )
    with jax.default_matmul_precision(prec):
        flow = jax.jit(
            lambda v, a, b: IFNet(compute_dtype=dt).apply(
                v, a, b, scale=(4, 2, 1), timestep=0.5)[0][-1]
        )(variables, f0, f1)
    golden = g["flow"].transpose(0, 2, 3, 1)  # 4-channel bidirectional flow
    ours = np.asarray(flow)
    d = np.linalg.norm(
        (ours - golden.astype(np.float32)).reshape(*ours.shape[:3], 2, 2), axis=-1
    )
    results[f"ifnet{tag} 1024x432 (bidir)"] = (float(d.mean()), float(d.max()))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alt", action="store_true",
                    help="also verify RAFT through the on-demand Pallas path")
    ap.add_argument("--bf16", action="store_true",
                    help="also run LFN3/simple_flow/IFNet under the bf16 "
                         "compute policy (looser 0.02 px budget)")
    ap.add_argument("--skip", default="", help="comma list: raft,lfn3,simple")
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    results = {}
    if "lfn3" not in skip:
        results.update(verify_lfn3())
        if args.bf16:
            results.update(verify_lfn3(bf16=True))
    if "simple" not in skip:
        results.update(verify_simple_ifnet())
        if args.bf16:
            results.update(verify_simple_ifnet(bf16=True))
    if "raft" not in skip:
        results.update(verify_raft(alternate_corr=False))
        if args.alt:
            results.update(verify_raft(alternate_corr=True))

    print("\n| family / setting | mean EPE delta (px) | max (px) |")
    print("|---|---|---|")
    ok = True
    for name, (mean, mx) in results.items():
        print(f"| {name} | {mean:.5f} | {mx:.4f} |")
        # bf16 rows trade precision for speed: 0.02 px budget (RAFT's bf16
        # gate bound); fp32 rows keep the 0.01 px parity bar
        ok = ok and mean < (0.02 if " bf16" in name else 0.01)
    print(json.dumps({"all_under_budget": ok}))


if __name__ == "__main__":
    main()
