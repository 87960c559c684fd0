"""L3 losses: supervised sequence/multiscale + unsupervised UFlow/UnFlow/LapLoss."""

from raft_optical_flow_tpu.losses.sequence import (
    multiscale_sequence_loss,
    sequence_loss,
)
from raft_optical_flow_tpu.losses.simple_flow_loss import (
    edge_aware_smoothness,
    simple_flow_loss,
)
from raft_optical_flow_tpu.losses.laploss import lap_loss, laploss
from raft_optical_flow_tpu.losses import uflow, unflow

__all__ = [
    "sequence_loss",
    "multiscale_sequence_loss",
    "simple_flow_loss",
    "edge_aware_smoothness",
    "lap_loss",
    "laploss",
    "uflow",
    "unflow",
]
