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
        # multi-process setup — an explicit coordinator address, or a TPU pod
        # worker list with MORE than one host (single-host images, including
        # the tunneled-TPU one, set TPU_WORKER_HOSTNAMES to one name).
        workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if not (
            os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")
            or "," in workers
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


def is_lead_host() -> bool:
    """True on the process that owns logging and checkpoint writes.

    In multi-host SPMD every process computes identical replicated metrics and
    parameters; only process 0 should print or write them (the hosts share a
    filesystem in pod setups, so concurrent orbax writes to one directory race).
    """
    import jax

    return jax.process_index() == 0


def fetch_replicated(tree):
    """Host-local numpy copy of fully-replicated (possibly multi-host) arrays.

    `np.asarray` / `jax.device_get` on a non-fully-addressable `jax.Array`
    routes through cross-host transfer machinery — a collective that every
    process must join, so calling it behind an `if lead:` gate deadlocks the
    pod (observed as a Gloo `GetKeyValue timed out` on the CPU mesh). For
    REPLICATED values (step metrics, parameters after an SPMD step) the local
    shard already holds the full value: copy from `addressable_data(0)`
    instead, which is collective-free and safe to call on any subset of
    processes. Single-process / fully-addressable arrays take the plain
    device_get path.
    """
    import jax
    import numpy as np

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


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
