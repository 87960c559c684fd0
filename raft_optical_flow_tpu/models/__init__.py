"""L2 model families: RAFT (standard + small), LiteFlowNet3, SimpleFlowNet, IFNet."""

from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig

__all__ = ["RAFT", "RAFTConfig"]
