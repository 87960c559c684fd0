"""Convert reference torch checkpoints to portable flax .npz trees.

Run in a torch-only process (torch and XLA CPU runtimes deadlock on OpenMP locks when
mixed in one process), so the JAX runtime never needs torch.

Usage: python tools/convert_checkpoints.py [--src /root/reference/raft-small.pth]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raft_optical_flow_tpu.utils.torch_convert import (  # noqa: E402
    convert_lfn3_checkpoint,
    convert_raft_checkpoint,
    save_flax_checkpoint,
)

REPO = os.path.join(os.path.dirname(__file__), "..")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/reference/raft-small.pth")
    p.add_argument("--dst", default=os.path.join(REPO, "checkpoints", "raft_small.npz"))
    p.add_argument("--arch", default="raft", choices=["raft", "liteflownet3"],
                   help="liteflownet3 also handles Lightning .ckpt files")
    args = p.parse_args()

    if args.arch == "raft":
        variables = convert_raft_checkpoint(args.src)
    else:
        variables = convert_lfn3_checkpoint(args.src)
    os.makedirs(os.path.dirname(args.dst), exist_ok=True)
    save_flax_checkpoint(variables, args.dst)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
