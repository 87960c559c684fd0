#!/bin/bash
# 4-stage curriculum (train_standard.sh parity): chairs -> things -> sintel -> kitti.
# The reference's 2-GPU DataParallel is replaced by SPMD over the device mesh (all
# local chips are used automatically).
set -e
mkdir -p checkpoints
python -u -m raft_optical_flow_tpu.cli.train_raft --name raft-chairs --stage chairs --validation chairs --num_steps 100000 --batch_size 10 --lr 0.0004 --image_size 368 496 --wdecay 0.0001
python -u -m raft_optical_flow_tpu.cli.train_raft --name raft-things --stage things --validation sintel --restore_ckpt checkpoints/raft-chairs.npz --num_steps 100000 --batch_size 6 --lr 0.000125 --image_size 400 720 --wdecay 0.0001
python -u -m raft_optical_flow_tpu.cli.train_raft --name raft-sintel --stage sintel --validation sintel --restore_ckpt checkpoints/raft-things.npz --num_steps 100000 --batch_size 6 --lr 0.000125 --image_size 368 768 --wdecay 0.00001 --gamma 0.85
python -u -m raft_optical_flow_tpu.cli.train_raft --name raft-kitti  --stage kitti  --validation kitti  --restore_ckpt checkpoints/raft-sintel.npz --num_steps 50000  --batch_size 6 --lr 0.0001   --image_size 288 960 --wdecay 0.00001 --gamma 0.85
