"""L4 data pipeline: codecs, dataset index builders, augmentors, input pipeline."""

from raft_optical_flow_tpu.data.frame_utils import (
    read_flow,
    write_flow,
    read_pfm,
    read_flow_kitti,
    write_flow_kitti,
    read_disp_kitti,
    read_gen,
)

__all__ = [
    "read_flow",
    "write_flow",
    "read_pfm",
    "read_flow_kitti",
    "write_flow_kitti",
    "read_disp_kitti",
    "read_gen",
]
