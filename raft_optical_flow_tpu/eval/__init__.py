"""L5 evaluation: validation metrics, benchmark submissions, warm-start helpers."""

from raft_optical_flow_tpu.eval.evaluate import (
    validate_chairs,
    validate_sintel,
    validate_kitti,
    forward_interpolate,
    make_raft_forward,
)

__all__ = [
    "validate_chairs",
    "validate_sintel",
    "validate_kitti",
    "forward_interpolate",
    "make_raft_forward",
]
