"""Training-memory advantage of the on-demand correlation at scale.

AOT-compiles a RAFT-standard training step (grad of sequence loss, 12 iters,
batch 1) on the TPU backend at growing resolutions — no execution, arguments are
ShapeDtypeStructs — and reports the compiler's HBM memory analysis for the
materialized-volume path vs the on-demand Pallas path. The quadratic
O((HW/64)^2) volume pushes the materialized path past the chip's 16 GB HBM at
~1440p, where the on-demand path (the alt_cuda_corr-equivalent kernel) still
fits — the trade the reference buys with CUDA (README.md:75-80), demonstrated at
a shape the reference's default path cannot run at all.

Usage: python tools/memory_advantage.py [HxW ...]   (default: three shapes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def analyze(H: int, W: int, alternate_corr: bool, remat: bool = False):
    from raft_optical_flow_tpu.models import RAFT, RAFTConfig
    from raft_optical_flow_tpu.losses.sequence import sequence_loss

    config = RAFTConfig(small=False, alternate_corr=alternate_corr, remat=remat)
    model = RAFT(config)

    img = jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32)
    flow = jax.ShapeDtypeStruct((1, H, W, 2), jnp.float32)
    valid = jax.ShapeDtypeStruct((1, H, W), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)),
            iters=1, test_mode=True,
        )
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def step(params, batch_stats, image1, image2, flow, valid):
        def loss_fn(p):
            preds = model.apply(
                {"params": p, "batch_stats": batch_stats},
                image1, image2, iters=12, train=True, freeze_bn=True,
            )
            loss, _ = sequence_loss(preds, flow, valid, gamma=0.8)
            return loss

        return jax.value_and_grad(loss_fn)(params)

    t0 = time.time()
    compiled = jax.jit(step).lower(params, batch_stats, img, img, flow, valid).compile()
    ma = compiled.memory_analysis()
    gb = 1024**3
    return {
        "temp_gb": ma.temp_size_in_bytes / gb,
        "arg_gb": ma.argument_size_in_bytes / gb,
        "out_gb": ma.output_size_in_bytes / gb,
        # The compiler's actual peak (buffers overlapping in time accounted);
        # the temp+arg+out sum above is an upper bound, not the peak.
        "peak_gb": (getattr(ma, "peak_memory_in_bytes", 0) or 0) / gb,
        "compile_s": time.time() - t0,
    }


def main():
    shapes = sys.argv[1:] or ["440x1024", "1088x1920", "1440x2560"]
    print("backend:", jax.default_backend())
    print("| resolution | path | temp (activations) GB | args GB | fits 16 GB HBM? |")
    print("|---|---|---|---|---|")
    for s in shapes:
        H, W = (int(x) for x in s.split("x"))
        for alt, remat in ((False, False), (True, False), (True, True)):
            name = "on-demand Pallas" if alt else "materialized volume"
            if remat:
                name += " + remat"
            try:
                r = analyze(H, W, alt, remat)
                # prefer the compiler's true peak; fall back to the buffer-sum
                # upper bound when the backend doesn't expose a peak
                total = r["peak_gb"] or (r["temp_gb"] + r["arg_gb"] + r["out_gb"])
                bound = "peak" if r["peak_gb"] else "upper bound"
                fits = "yes" if total < 16.0 else f"NO ({total:.1f} GB)"
                print(
                    f"| {H}x{W} | {name} | {r['temp_gb']:.2f} | {r['arg_gb']:.2f} "
                    f"| {fits} ({total:.2f} GB {bound}) |  (compile {r['compile_s']:.0f}s)",
                    flush=True,
                )
            except Exception as e:
                print(f"| {H}x{W} | {name} | COMPILE FAIL: "
                      f"{str(e).splitlines()[0][:120]} | | |", flush=True)


if __name__ == "__main__":
    main()
