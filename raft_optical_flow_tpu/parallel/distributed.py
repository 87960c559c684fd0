"""Multi-host (multi-process) SPMD wiring.

The reference's distribution story tops out at single-process `nn.DataParallel`
over 2 GPUs (`train.py:172`, SURVEY.md §2.7). The TPU-native scale-out is
multi-process SPMD: every host runs the same program, `jax.distributed` connects
them through a coordination service, the mesh spans all global devices, each host
feeds only its own shard of the global batch, and XLA reduces gradients over
ICI/DCN automatically.

Three pieces:
  - `initialize(...)` — wraps `jax.distributed.initialize`; no-op when running
    single-process so all entry points can call it unconditionally.
  - `FlowDataLoader(num_shards=jax.process_count(), shard_id=jax.process_index())`
    (data/pipeline.py) — per-host input sharding: each process loads the same
    deterministic global index stream but materializes only its contiguous slice
    of every global batch, so the global batch content is independent of the
    process count.
  - `parallel.mesh.shard_batch` — assembles the host-local slices into one global
    sharded array via `jax.make_array_from_process_local_data` when
    `jax.process_count() > 1`.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the multi-host coordination service.

    With no arguments, resolves from the standard JAX env vars / cloud TPU
    metadata (`jax.distributed.initialize()` auto-detection); explicit arguments
    take priority. Safe to call when single-process: if no coordinator can be
    resolved and no multi-process env is present, this is a no-op.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        # no explicit request: only initialize when the environment declares a
        # multi-process setup (manual env vars or cloud TPU metadata).
        if not (
            os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("TPU_WORKER_HOSTNAMES")
        ):
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info():
    """(process_index, process_count) — loader sharding arguments."""
    import jax

    return jax.process_index(), jax.process_count()


def assert_batch_divisible(global_batch_size: int) -> int:
    """Per-host batch size; raises if the global batch doesn't split evenly."""
    import jax

    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"process count {n}"
        )
    return global_batch_size // n
