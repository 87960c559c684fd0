"""Multi-chip tests on the virtual 8-device CPU mesh: DP sharding + spatial axis."""

import numpy as np
import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.kernels.corr_ondemand import ondemand_corr_pyramid
from raft_optical_flow_tpu.ops.corr import avg_pool2x2
from raft_optical_flow_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from raft_optical_flow_tpu.parallel.spatial import spatial_sharded_ondemand_corr


def _f2_pyramid(fmap2, levels):
    pyr = [fmap2]
    for _ in range(levels - 1):
        pyr.append(avg_pool2x2(pyr[-1].transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1))
    return tuple(pyr)


def test_mesh_and_batch_sharding():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = {"x": jnp.zeros((16, 4, 4, 3))}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh)


def test_two_axis_mesh():
    mesh = make_mesh(axis_names=("data", "space"), shape=(4, 2))
    assert mesh.shape["data"] == 4 and mesh.shape["space"] == 2


def test_spatial_sharded_corr_matches_single_device():
    rng = np.random.RandomState(0)
    B, H, W, C = 1, 16, 24, 16
    fmap1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fmap2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    gy, gx = np.mgrid[0:H, 0:W]
    coords = jnp.asarray(
        (np.stack([gx, gy], -1)[None] + rng.uniform(-3, 3, (B, H, W, 2))).astype(
            np.float32
        )
    )
    pyr = _f2_pyramid(fmap2, 3)

    ref = np.asarray(ondemand_corr_pyramid(fmap1, pyr, coords, 3))

    mesh = make_mesh(axis_names=("space",))
    out = spatial_sharded_ondemand_corr(fmap1, pyr, coords, 3, mesh)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # result really is sharded over the row axis
    spec = out.sharding.spec
    assert "space" in str(spec)
