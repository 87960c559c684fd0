"""Demo CLI — replaces `demo.py` / `demo_simple_flow.py` / `liteflownet3_demo.py`.

Runs a model over consecutive frame pairs in a directory and writes stacked
image + flow-visualization PNGs (`demo.py:44-67` semantics):

  python -m raft_optical_flow_tpu.cli.demo --model checkpoints/raft_small.npz \
      --small --path /root/reference/demo-frames --out demo_out
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def create_demo_images(output_dir: str = "./demo_images", size: int = 256):
    """Synthetic demo pair: a circle moving +40 px in x (`demo_simple_flow.py:225-258`)."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    y, x = np.ogrid[:size, :size]
    paths = []
    for i, cx in enumerate((size // 2 - 20, size // 2 + 20)):
        img = np.zeros((size, size, 3), np.uint8)
        img[(x - cx) ** 2 + (y - size // 2) ** 2 <= 30**2] = [255, 0, 0]
        p = os.path.join(output_dir, f"img{i + 1}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    return tuple(paths)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="converted .npz checkpoint")
    parser.add_argument("--arch", default="raft",
                        choices=["raft", "liteflownet3", "liteflownet3s",
                                 "simple_flow", "ifnet"])
    parser.add_argument("--path", default=None, help="directory of frames")
    parser.add_argument("--synthetic", action="store_true",
                        help="generate and use a synthetic demo pair")
    parser.add_argument("--out", default="demo_out")
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--alternate_corr", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from raft_optical_flow_tpu.ops.padding import InputPadder
    from raft_optical_flow_tpu.utils.flow_viz import flow_to_image
    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    variables = jax.tree.map(jnp.asarray, load_flax_checkpoint(args.model))

    if args.arch == "raft":
        from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig

        config = RAFTConfig(small=args.small, alternate_corr=args.alternate_corr)
        model = RAFT(config)
        fwd = jax.jit(
            lambda a, b: model.apply(variables, a, b, iters=args.iters,
                                     test_mode=True)[1]
        )
        needs_pad, scale255 = True, True
    elif args.arch.startswith("liteflownet3"):
        from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3

        model = LiteFlowNet3(LFN3Config(use_s_version=args.arch.endswith("s")))
        fwd = jax.jit(
            lambda a, b: model.apply(variables, jnp.stack([a, b], 1) / 255.0)["flows"][:, 0]
        )
        needs_pad, scale255 = False, True
    elif args.arch == "simple_flow":
        from raft_optical_flow_tpu.models.simple_flow import SimpleFlowConfig, SimpleFlowNet

        model = SimpleFlowNet(SimpleFlowConfig())

        def fwd_fn(a, b):
            preds = model.apply(variables, a / 255.0, b / 255.0)
            from raft_optical_flow_tpu.ops.grid import resize_bilinear

            f = preds[-1]  # finest (1/2 res)
            return resize_bilinear(f, a.shape[1:3]) * 2.0

        fwd = jax.jit(fwd_fn)
        needs_pad, scale255 = True, True
    else:  # ifnet
        from raft_optical_flow_tpu.models.ifnet import IFNet

        model = IFNet()
        fwd = jax.jit(
            lambda a, b: model.apply(variables, a / 255.0, b / 255.0)[0][-1][..., 2:4]
        )
        needs_pad, scale255 = True, True

    if args.synthetic:
        args.path = os.path.join(args.out, "demo_images")
        create_demo_images(args.path)
    if args.path is None:
        parser.error("--path or --synthetic required")
    frames = sorted(
        glob.glob(os.path.join(args.path, "*.png"))
        + glob.glob(os.path.join(args.path, "*.jpg"))
    )
    os.makedirs(args.out, exist_ok=True)
    for i, (f1, f2) in enumerate(zip(frames[:-1], frames[1:])):
        img1 = np.array(Image.open(f1)).astype(np.float32)
        img2 = np.array(Image.open(f2)).astype(np.float32)
        a = jnp.asarray(img1)[None]
        b = jnp.asarray(img2)[None]
        if needs_pad:
            padder = InputPadder((1,) + img1.shape)
            a, b = padder.pad(a, b)
            flow = np.asarray(padder.unpad(fwd(a, b)))[0]
        else:
            flow = np.asarray(fwd(a, b))[0]
        viz = flow_to_image(flow)
        stacked = np.concatenate([img1.astype(np.uint8), viz], axis=0)
        out_path = os.path.join(args.out, f"flow_{i:04d}.png")
        Image.fromarray(stacked).save(out_path)
        print(f"{f1} -> {out_path}  (|flow| mean {np.linalg.norm(flow, axis=-1).mean():.2f})")


if __name__ == "__main__":
    main()
