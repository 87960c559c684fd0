"""Device mesh construction and sharding helpers.

Design (SURVEY.md §2.7): the reference's only parallelism is data parallelism
(`nn.DataParallel` over 2 GPUs). TPU-native equivalent: a 1-D (or 2-D ici x dcn)
mesh; the batch dimension of inputs is sharded over 'data', parameters are
replicated, and XLA inserts the gradient psum over ICI automatically when a jitted
loss of sharded inputs is differentiated wrt replicated params.

A second, optional 'space' axis supports spatial sharding of the correlation volume's
query-pixel axis for very large frames (the memory axis the reference attacks with
alt_cuda_corr instead).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n_devices devices.

    With one axis name, the mesh is 1-D over all (or n) devices. `shape` allows
    multi-axis meshes, e.g. axis_names=('data', 'space'), shape=(4, 2).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_hybrid_mesh(
    dcn_axis: int = 1,
    axis_names: Sequence[str] = ("dcn", "data"),
) -> Mesh:
    """Multi-slice mesh: outer 'dcn' axis across slices/hosts, inner ICI axis.

    The multi-pod extension of the DP design (SURVEY.md §2.7): gradients psum
    hierarchically — XLA reduces within a slice over ICI, then across slices
    over DCN. On a single slice this degenerates to make_mesh.
    """
    from jax.experimental import mesh_utils

    n = len(jax.devices())
    if dcn_axis <= 1:
        return make_mesh(axis_names=axis_names, shape=(1, n))
    dev_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, n // dcn_axis),
        dcn_mesh_shape=(dcn_axis, 1),
    )
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard a pytree of [N, ...] arrays with N split over `axis`.

    Single-process: a device_put with the named sharding. Multi-process: the
    pytree holds each host's local slice of the global batch (per-host input
    sharding, data/pipeline.py), and the global array is assembled with
    `jax.make_array_from_process_local_data` — the SPMD replacement for
    DataParallel's scatter (`train.py:172`) that also spans hosts.
    """
    sh = batch_sharding(mesh, axis)
    n_shards = mesh.shape[axis]
    for leaf in jax.tree.leaves(batch):
        n = np.shape(leaf)[0] * (jax.process_count() if jax.process_count() > 1
                                 and getattr(leaf, "is_fully_addressable", True)
                                 else 1)
        if n % n_shards:
            raise ValueError(
                f"global batch size {n} not divisible by the mesh '{axis}' "
                f"axis ({n_shards} devices) — pick a batch size that is a "
                f"multiple of the device count"
            )
        break
    if jax.process_count() > 1:
        # Idempotent: a leaf that is already a global (non-fully-addressable)
        # array — e.g. a batch that went through prefetch_to_device(mesh=...)
        # before reaching the trainer — passes through unchanged; assembling
        # it again would require host-local data that no longer exists.
        return jax.tree.map(
            lambda x: x
            if isinstance(x, jax.Array) and not x.is_fully_addressable
            else jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    if mesh.devices.size == 1:
        # Single chip: a trivial NamedSharding is semantically identical to a
        # plain placement, but on this image's tunneled TPU runtime NamedSharded
        # inputs trigger per-dispatch resharding transfers — measured 166 ms ->
        # 9.5 s per RAFT train step. Plain device_put sidesteps it.
        return jax.tree.map(
            lambda x: jax.device_put(x, mesh.devices.flat[0]), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
