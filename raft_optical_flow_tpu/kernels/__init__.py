"""L0 Pallas TPU kernels for the correlation hot path.

Two kernels replace the reference's native-code layer (`alt_cuda_corr/`, CUDA) with
TPU-native Pallas:

  - `corr_lookup.corr_pyramid_lookup_pallas` — the per-GRU-iteration windowed lookup
    over a materialized correlation pyramid (`core/corr.py:56-94` semantics).
  - `corr_ondemand.ondemand_corr_pyramid` — on-demand (2r+1)^2 local correlation at
    fractional coords computed directly from the feature maps, never materializing the
    HW x HW all-pairs volume (`alt_cuda_corr/correlation_kernel.cu:19-119` semantics).

Both run in interpret mode automatically on CPU so the test-suite / multi-chip dry run
(virtual CPU devices) exercise the same code paths as the TPU.
"""

from raft_optical_flow_tpu.kernels.corr_lookup import corr_pyramid_lookup_pallas
from raft_optical_flow_tpu.kernels.corr_ondemand import ondemand_corr_pyramid

__all__ = ["corr_pyramid_lookup_pallas", "ondemand_corr_pyramid"]
