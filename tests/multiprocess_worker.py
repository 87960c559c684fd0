"""Worker for the multi-process SPMD test (tests/test_multiprocess.py).

Runs one RAFT train step on a mesh spanning all global devices, feeding this
process's shard of a deterministic synthetic global batch through the sharded
FlowDataLoader, and prints the step metrics as one JSON line. Invoked as:

    python multiprocess_worker.py <num_processes> <process_id> <port>

With num_processes == 1 it runs plain single-process SPMD (the oracle).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_PROCS = int(sys.argv[1])
PROC_ID = int(sys.argv[2])
PORT = int(sys.argv[3])

# 4 virtual CPU devices per process; must be set before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from raft_optical_flow_tpu.parallel import distributed  # noqa: E402

if NUM_PROCS > 1:
    distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NUM_PROCS,
        process_id=PROC_ID,
    )

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raft_optical_flow_tpu.data.pipeline import FlowDataLoader  # noqa: E402
from raft_optical_flow_tpu.models import RAFTConfig  # noqa: E402
from raft_optical_flow_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from raft_optical_flow_tpu.train.configs import StageConfig  # noqa: E402
from raft_optical_flow_tpu.train.trainer import create_train_state, raft_train_step  # noqa: E402

H, W = 48, 64


class SyntheticFlowDataset:
    """Deterministic samples derived from the index alone (process-independent)."""

    def __len__(self):
        return 32

    def __getitem__(self, index, rng=None):
        r = np.random.default_rng(1000 + index)
        img1 = r.uniform(0, 255, (H, W, 3)).astype(np.float32)
        img2 = r.uniform(0, 255, (H, W, 3)).astype(np.float32)
        flow = r.uniform(-3, 3, (H, W, 2)).astype(np.float32)
        valid = np.ones((H, W), np.float32)
        return img1, img2, flow, valid


def main():
    assert jax.process_count() == NUM_PROCS, (jax.process_count(), NUM_PROCS)
    assert len(jax.devices()) == 4 * NUM_PROCS

    mesh = make_mesh()  # spans all global devices
    loader = FlowDataLoader(
        SyntheticFlowDataset(), batch_size=8, num_workers=1,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )
    batch = next(iter(loader))
    assert batch["image1"].shape[0] == 8 // NUM_PROCS
    batch = shard_batch(batch, mesh)

    config = RAFTConfig(small=True)
    stage = StageConfig(
        name="mp", stage="chairs", num_steps=10, batch_size=8, lr=4e-4,
        image_size=(H, W), freeze_bn=False,
    )
    state = create_train_state(jax.random.PRNGKey(0), config, stage, (H, W))
    step = jax.jit(
        lambda s, b: raft_train_step(
            s, b, jax.random.PRNGKey(1), config=config, iters=2, freeze_bn=False
        )
    )
    new_state, metrics = step(state, batch)
    # every metric is fully replicated; pull through an addressable shard
    scalars = {
        k: float(np.asarray(jax.device_get(v.addressable_data(0))))
        for k, v in metrics.items()
    }
    param_sum = float(
        sum(
            np.abs(np.asarray(jax.device_get(x.addressable_data(0)))).sum()
            for x in jax.tree.leaves(new_state.params)
        )
    )
    scalars["param_abs_sum"] = param_sum
    print("METRICS " + json.dumps(scalars, sort_keys=True))


if __name__ == "__main__":
    main()
