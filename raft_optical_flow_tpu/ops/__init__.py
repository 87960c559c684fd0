"""L1 tensor ops: sampling, warping, correlation, resizing, padding.

All ops use NHWC layout and pixel-space coordinates with channel order (x, y),
matching the reference semantics (`core/utils/utils.py`, `core/corr.py`) while being
jit-friendly (static shapes, no boolean indexing).
"""

from raft_optical_flow_tpu.ops.grid import (
    coords_grid,
    bilinear_sampler,
    grid_sample_nearest,
    resize_bilinear_align_corners,
    upflow8,
)
from raft_optical_flow_tpu.ops.upsample import convex_upsample
from raft_optical_flow_tpu.ops.padding import InputPadder, InputScaler
from raft_optical_flow_tpu.ops.corr import (
    all_pairs_correlation,
    build_corr_pyramid,
    corr_pyramid_lookup,
    avg_pool2x2,
)
from raft_optical_flow_tpu.ops.warp import (
    backward_warp,
    flow_to_warp,
    forward_splat,
    forward_splat_range_map,
    warp_lfn3,
)
from raft_optical_flow_tpu.ops.spatial_corr import (
    spatial_correlation_sample,
    translated_spatial_correlation_sample,
)

__all__ = [
    "coords_grid",
    "bilinear_sampler",
    "grid_sample_nearest",
    "resize_bilinear_align_corners",
    "upflow8",
    "convex_upsample",
    "InputPadder",
    "InputScaler",
    "all_pairs_correlation",
    "build_corr_pyramid",
    "corr_pyramid_lookup",
    "avg_pool2x2",
    "backward_warp",
    "flow_to_warp",
    "forward_splat",
    "forward_splat_range_map",
    "warp_lfn3",
    "spatial_correlation_sample",
    "translated_spatial_correlation_sample",
]
