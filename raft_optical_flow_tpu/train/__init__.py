"""L5 training: train state, optimizers, SPMD train steps, stage curriculum configs."""

from raft_optical_flow_tpu.train.trainer import (
    RAFTTrainer,
    TrainState,
    make_optimizer,
    raft_train_step,
)
from raft_optical_flow_tpu.train.configs import StageConfig, STANDARD_CURRICULUM

__all__ = [
    "RAFTTrainer",
    "TrainState",
    "make_optimizer",
    "raft_train_step",
    "StageConfig",
    "STANDARD_CURRICULUM",
]
