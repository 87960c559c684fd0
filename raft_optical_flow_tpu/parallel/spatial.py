"""Spatial sharding of the correlation query axis across chips.

The reference attacks the O((HW)^2) all-pairs correlation memory axis with its
on-demand CUDA kernel (`core/corr.py:130-198`); the TPU-native scaling axis on top
of that is sharding the *query-pixel* rows over a mesh 'space' axis: every query's
window lookup only reads the (replicated) frame-2 feature pyramid, so the shard_map
needs no halo exchange and no collectives — each chip computes its row-slab of
correlation features locally (SURVEY.md §2.7 "sequence-parallel analog").

Composes with data parallelism as a 2-D mesh ('data', 'space').
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P


def spatial_sharded_ondemand_corr(
    fmap1: jax.Array,
    fmap2_pyramid: Sequence[jax.Array],
    coords: jax.Array,
    radius: int,
    mesh: Mesh,
    axis: str = "space",
) -> jax.Array:
    """On-demand windowed correlation with query rows sharded over `axis`.

    fmap1: [B, h, w, C]; fmap2_pyramid: tuple of [B, Hl, Wl, C] (replicated);
    coords: [B, h, w, 2]. h must be divisible by the axis size. Returns
    [B, h, w, L*(2r+1)^2], row-sharded over `axis`.
    """
    from raft_optical_flow_tpu.kernels.corr_ondemand import ondemand_corr_pyramid

    n = mesh.shape[axis]
    h = fmap1.shape[1]
    if h % n != 0:
        raise ValueError(f"query rows ({h}) must divide the '{axis}' axis size ({n})")

    fn = jax.shard_map(
        functools.partial(ondemand_corr_pyramid, radius=radius),
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None),              # fmap1: rows sharded
            tuple(P(None, None, None, None) for _ in fmap2_pyramid),  # replicated
            P(None, axis, None, None),              # coords: rows sharded
        ),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return fn(fmap1, tuple(fmap2_pyramid), coords)
