"""L7 parallelism: device mesh, shardings, SPMD data parallelism.

Replaces the reference's single-process `nn.DataParallel` 2-GPU setup
(`train.py:172`, `train_standard.sh:3-6`) with pjit-style SPMD over a
`jax.sharding.Mesh`: batch sharded over the 'data' axis, parameters replicated,
gradient all-reduce inserted by XLA over ICI.
"""

from raft_optical_flow_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from raft_optical_flow_tpu.parallel import distributed

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "distributed",
]
