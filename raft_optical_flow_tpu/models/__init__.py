"""L2 model families: RAFT (standard + small), LiteFlowNet3, SimpleFlowNet, IFNet."""

from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig
from raft_optical_flow_tpu.models.liteflownet3 import (
    LFN3Config,
    LiteFlowNet3,
    liteflownet3,
    liteflownet3_pseudoreg,
    liteflownet3s,
    liteflownet3s_pseudoreg,
)

__all__ = [
    "RAFT",
    "RAFTConfig",
    "LFN3Config",
    "LiteFlowNet3",
    "liteflownet3",
    "liteflownet3_pseudoreg",
    "liteflownet3s",
    "liteflownet3s_pseudoreg",
]
