"""L3 losses: supervised sequence / multi-scale, unsupervised UFlow / UnFlow, laploss."""

from raft_optical_flow_tpu.losses.sequence import sequence_loss, multiscale_sequence_loss

__all__ = ["sequence_loss", "multiscale_sequence_loss"]
