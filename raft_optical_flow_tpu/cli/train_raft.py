"""RAFT training CLI — replaces the reference `train.py` (+ train_standard.sh).

Flags mirror `train.py:270-292`; the 4-stage curriculum of `train_standard.sh:3-6`
is available as --curriculum standard|mixed (StageConfig presets). Example:

  python -m raft_optical_flow_tpu.cli.train_raft --name raft-chairs --stage chairs \
      --num_steps 100000 --batch_size 10 --lr 4e-4 --image_size 368 496
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", default="raft", help="name your experiment")
    parser.add_argument("--stage", required=True,
                        help="dataset stage: chairs | things | sintel | kitti")
    parser.add_argument("--restore_ckpt", default=None,
                        help=".npz (converted) checkpoint to warm start from")
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--validation", type=str, nargs="+", default=[])
    parser.add_argument("--lr", type=float, default=4e-4)
    parser.add_argument("--num_steps", type=int, default=100000)
    parser.add_argument("--batch_size", type=int, default=6)
    parser.add_argument("--image_size", type=int, nargs="+", default=[384, 512])
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--wdecay", type=float, default=5e-5)
    parser.add_argument("--epsilon", type=float, default=1e-8)
    parser.add_argument("--clip", type=float, default=1.0)
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--gamma", type=float, default=0.8,
                        help="exponential weighting")
    parser.add_argument("--add_noise", action="store_true")
    parser.add_argument("--alternate_corr", action="store_true",
                        help="use the on-demand (volume-free) correlation")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--data_root", default=None,
                        help="override the stage dataset root")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on warped-pair synthetic data (no dataset needed)")
    parser.add_argument("--resume", action="store_true",
                        help="resume full train state from the latest orbax checkpoint")
    parser.add_argument("--checkpoint_dir", default="checkpoints")
    parser.add_argument("--val_freq", type=int, default=5000)
    parser.add_argument("--dist_coordinator", default=None,
                        help="multi-host: coordinator address host:port")
    parser.add_argument("--dist_num_processes", type=int, default=None)
    parser.add_argument("--dist_process_id", type=int, default=None)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu for debugging; "
                             "this image registers the TPU even when "
                             "JAX_PLATFORMS=cpu is set)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # Multi-host SPMD: connect to the coordination service BEFORE any other jax
    # use, so the mesh spans all hosts' devices (`train.py:172` replacement at
    # pod scale; no-op single-process).
    from raft_optical_flow_tpu.parallel import distributed

    distributed.initialize(args.dist_coordinator, args.dist_num_processes,
                           args.dist_process_id)

    import jax
    import jax.numpy as jnp

    from raft_optical_flow_tpu.data.datasets import fetch_dataset
    from raft_optical_flow_tpu.data.pipeline import FlowDataLoader
    from raft_optical_flow_tpu.models.raft import RAFTConfig
    from raft_optical_flow_tpu.train.configs import StageConfig
    from raft_optical_flow_tpu.train.trainer import RAFTTrainer
    from raft_optical_flow_tpu.utils.torch_convert import load_flax_checkpoint

    stage = StageConfig(
        name=args.name, stage=args.stage, num_steps=args.num_steps,
        batch_size=args.batch_size, lr=args.lr,
        image_size=tuple(args.image_size), wdecay=args.wdecay, gamma=args.gamma,
        iters=args.iters, clip=args.clip, epsilon=args.epsilon, small=args.small,
        mixed_precision=args.mixed_precision, add_noise=args.add_noise,
        freeze_bn=(args.stage != "chairs"),  # `train.py:182`
        val_freq=args.val_freq, seed=args.seed,
    )
    config = RAFTConfig(
        small=args.small, dropout=args.dropout, alternate_corr=args.alternate_corr,
        compute_dtype=jnp.bfloat16 if args.mixed_precision else jnp.float32,
    )
    restore = load_flax_checkpoint(args.restore_ckpt) if args.restore_ckpt else None

    trainer = RAFTTrainer(stage, config=config, restore_variables=restore,
                          checkpoint_dir=args.checkpoint_dir)
    if args.synthetic:
        from raft_optical_flow_tpu.data.synthetic import SyntheticFlowDataset

        dataset = SyntheticFlowDataset(crop=stage.image_size)
    else:
        roots = {args.stage: args.data_root} if args.data_root else None
        dataset = fetch_dataset(args.stage, stage.image_size, roots=roots)
    if distributed.is_lead_host():
        print(f"Training with {len(dataset)} image pairs "
              f"on {jax.device_count()} devices / {jax.process_count()} hosts")
    # batch_size is GLOBAL; each host loads only its shard of every batch.
    # trainer.run handles resume fast-forward + device prefetch itself.
    loader = FlowDataLoader(dataset, batch_size=args.batch_size,
                            num_workers=args.num_workers, seed=args.seed,
                            num_shards=jax.process_count(),
                            shard_id=jax.process_index())

    val_fn = None
    if args.validation:
        from raft_optical_flow_tpu.cli.evaluate import make_validation_fn

        val_fn = make_validation_fn(args.validation, config, args.iters,
                                    data_root=args.data_root)

    trainer.run(loader, num_steps=args.num_steps, val_fn=val_fn,
                resume=args.resume)


if __name__ == "__main__":
    main()
