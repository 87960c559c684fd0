"""Training CLI for the LFN3 / SimpleFlowNet / IFNet families (sup + unsup).

Replaces the reference drivers `train_liteflownet3.py`,
`train_liteflownet3_unsupervised.py`, `train_simple_flow.py`,
`train_simple_flow_unsupervised.py`, and `IFNET_train.py`:

  python -m raft_optical_flow_tpu.cli.train_flow --model lfn3 --stage sintel \
      --num_steps 20000 --batch_size 8 --lr 1e-4
  python -m raft_optical_flow_tpu.cli.train_flow --model simple_flow --unsupervised ...

With --synthetic the trainer runs on random tensors (the reference's DummyDataset
fallback, `train_simple_flow.py:180-228`).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def _synthetic_batches(batch_size, image_size, seed=0, num_shards=1, shard_id=0):
    """Random-tensor batches (DummyDataset role). batch_size is GLOBAL; under
    multi-host each process draws the same global batch and keeps its slice."""
    if batch_size % num_shards != 0:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by num_shards="
            f"{num_shards} (mirrors FlowDataLoader)")
    rng = np.random.RandomState(seed)
    H, W = image_size
    lo = shard_id * (batch_size // num_shards)
    hi = lo + batch_size // num_shards
    while True:
        batch = {
            "image1": rng.uniform(0, 255, (batch_size, H, W, 3)).astype(np.float32),
            "image2": rng.uniform(0, 255, (batch_size, H, W, 3)).astype(np.float32),
            "flow": rng.uniform(-5, 5, (batch_size, H, W, 2)).astype(np.float32),
            "valid": np.ones((batch_size, H, W), np.float32),
        }
        yield {k: v[lo:hi] for k, v in batch.items()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["lfn3", "lfn3s", "simple_flow", "ifnet"])
    parser.add_argument("--unsupervised", action="store_true")
    parser.add_argument("--stage", default="sintel",
                        help="dataset stage: chairs | things | sintel | kitti")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on random tensors (DummyDataset fallback)")
    parser.add_argument("--num_steps", type=int, default=10000)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--lr_step_size", type=int, default=10000)
    parser.add_argument("--image_size", type=int, nargs="+", default=[384, 768])
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--restore_ckpt", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume full train state from the latest orbax checkpoint")
    parser.add_argument("--checkpoint_dir", default="checkpoints")
    parser.add_argument("--val_freq", type=int, default=5000)
    parser.add_argument("--dist_coordinator", default=None,
                        help="multi-host: coordinator address host:port")
    parser.add_argument("--dist_num_processes", type=int, default=None)
    parser.add_argument("--dist_process_id", type=int, default=None)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu for debugging)")
    args = parser.parse_args()

    if args.platform:
        import jax as _jax_cfg

        _jax_cfg.config.update("jax_platforms", args.platform)

    # Multi-host SPMD: connect before any other jax use (no-op single-process).
    from raft_optical_flow_tpu.parallel import distributed

    distributed.initialize(args.dist_coordinator, args.dist_num_processes,
                           args.dist_process_id)

    import jax

    from raft_optical_flow_tpu.train.trainers import FlowTrainer, OptimConfig
    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    base = "lfn3" if args.model.startswith("lfn3") else args.model
    kind = base + ("_unsup" if args.unsupervised else "")
    model_config = None
    if args.model.startswith("lfn3"):
        from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config

        model_config = LFN3Config(use_s_version=args.model.endswith("s"))

    optim = OptimConfig(
        lr=args.lr, weight_decay=args.weight_decay, adamw=(base != "lfn3"),
        step_size=args.lr_step_size,
    )
    restore = load_flax_checkpoint(args.restore_ckpt) if args.restore_ckpt else None
    image_size = tuple(args.image_size)
    trainer = FlowTrainer(
        kind, image_size=image_size, model_config=model_config, optim=optim,
        seed=args.seed, restore_variables=restore, checkpoint_dir=args.checkpoint_dir,
    )

    if args.synthetic:
        data_iter = _synthetic_batches(
            args.batch_size, image_size, args.seed,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
        )
    else:
        from raft_optical_flow_tpu.data.datasets import fetch_dataset
        from raft_optical_flow_tpu.data.pipeline import FlowDataLoader

        roots = {args.stage: args.data_root} if args.data_root else None
        dataset = fetch_dataset(args.stage, image_size, roots=roots)
        if distributed.is_lead_host():
            print(f"Training with {len(dataset)} image pairs "
                  f"on {jax.device_count()} devices / {jax.process_count()} hosts")
        # batch_size is GLOBAL; each host loads only its shard of every batch.
        # trainer.run handles resume fast-forward + device prefetch itself.
        data_iter = FlowDataLoader(dataset, batch_size=args.batch_size,
                                   num_workers=args.num_workers, seed=args.seed,
                                   num_shards=jax.process_count(),
                                   shard_id=jax.process_index())

    trainer.run(data_iter, num_steps=args.num_steps, val_freq=args.val_freq,
                resume=args.resume)


if __name__ == "__main__":
    main()
