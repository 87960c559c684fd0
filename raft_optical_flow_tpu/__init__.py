"""raft_optical_flow_tpu — TPU-native optical-flow framework (JAX / XLA / Pallas / pjit).

From-scratch rebuild of the capabilities of the reference PyTorch repo
`wangty537/raft_optical_flow` (RAFT, LiteFlowNet3, SimpleFlowNet, IFNet; supervised +
unsupervised training; FlyingChairs/Things/Sintel/KITTI/HD1K data pipeline), designed
TPU-first: NHWC layouts, static shapes, `lax.scan` recurrences, Pallas kernels for the
correlation hot path, and SPMD data parallelism over a `jax.sharding.Mesh`.

Layering (see SURVEY.md §7):
    ops/       L1 tensor ops (sampling, warping, correlation, resize, padding)
    kernels/   L0 Pallas TPU kernels (corr lookup, on-demand correlation)
    models/    L2 model families (RAFT, LiteFlowNet3, SimpleFlowNet, IFNet)
    losses/    L3 supervised + unsupervised losses
    data/      L4 codecs, datasets, augmentors, input pipeline
    train/     L5 trainers + stage-curriculum configs
    eval/      L5 validation + submission writers
    parallel/  L7 mesh / sharding / collectives
    utils/     L6 flow viz, logging, checkpointing, torch->jax conversion
"""

__version__ = "0.1.0"
