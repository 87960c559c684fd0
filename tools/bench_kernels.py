"""Micro-benchmark: Pallas correlation kernels vs XLA fallbacks on the real chip.

Run directly (no JAX_PLATFORMS override) to compile with Mosaic on TPU. Shapes match
RAFT-standard on Sintel 1024x440 (1/8 res 55x128, C=256, r=4).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready does not reliably block through the axon tunnel; force a
    # scalar to host instead.
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(fn, *args, n=10):
    _sync(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from raft_optical_flow_tpu.kernels.corr_lookup import corr_pyramid_lookup_pallas
    from raft_optical_flow_tpu.kernels.corr_ondemand import (
        _ondemand_xla,
        ondemand_corr_pyramid,
    )
    from raft_optical_flow_tpu.ops.corr import (
        all_pairs_correlation,
        avg_pool2x2,
        build_corr_pyramid,
        corr_pyramid_lookup,
    )

    print("backend:", jax.default_backend(), jax.devices()[0])
    B, H, W, C, r = 1, 55, 128, 256, 4
    rng = np.random.RandomState(0)
    fmap1 = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    fmap2 = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    gy, gx = np.mgrid[0:H, 0:W]
    coords = np.stack([gx, gy], -1)[None].astype(np.float32) + rng.uniform(
        -8, 8, (B, H, W, 2)
    ).astype(np.float32)
    coords = jnp.asarray(coords)

    pyr = jax.jit(lambda a, b: build_corr_pyramid(all_pairs_correlation(a, b), 4))(
        fmap1, fmap2
    )
    jax.block_until_ready(pyr)

    f2pyr = [fmap2]
    for _ in range(3):
        f2pyr.append(avg_pool2x2(f2pyr[-1].transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1))
    f2pyr = tuple(jax.block_until_ready(jnp.asarray(x)) for x in f2pyr)

    lookup_xla = jax.jit(lambda p, c: corr_pyramid_lookup(p, c, r))
    lookup_pl = jax.jit(lambda p, c: corr_pyramid_lookup_pallas(p, c, r, interpret=False))
    od_xla = jax.jit(lambda f1, f2s, c: _ondemand_xla(f1, f2s, c, r))
    od_pl = jax.jit(
        lambda f1, f2s, c: ondemand_corr_pyramid(f1, f2s, c, r, interpret=False)
    )

    ref = lookup_xla(pyr, coords)
    try:
        got = lookup_pl(pyr, coords)
        err = float(jnp.max(jnp.abs(got - ref)))
        t_ref = timeit(lookup_xla, pyr, coords)
        t_pl = timeit(lookup_pl, pyr, coords)
        print(f"lookup:   xla {t_ref*1e3:.3f} ms   pallas {t_pl*1e3:.3f} ms   maxerr {err:.2e}")
    except Exception as e:
        print("lookup pallas FAILED:", type(e).__name__, str(e)[:500])

    ref = od_xla(fmap1, f2pyr, coords)
    try:
        got = od_pl(fmap1, f2pyr, coords)
        err = float(jnp.max(jnp.abs(got - ref)))
        t_ref = timeit(od_xla, fmap1, f2pyr, coords)
        t_pl = timeit(od_pl, fmap1, f2pyr, coords)
        print(f"ondemand: xla {t_ref*1e3:.3f} ms   pallas {t_pl*1e3:.3f} ms   maxerr {err:.2e}")
    except Exception as e:
        print("ondemand pallas FAILED:", type(e).__name__, str(e)[:500])

    # all-pairs volume build cost for context
    t_vol = timeit(
        jax.jit(lambda a, b: build_corr_pyramid(all_pairs_correlation(a, b), 4)),
        fmap1,
        fmap2,
    )
    print(f"all-pairs volume + pyramid build: {t_vol*1e3:.3f} ms")


if __name__ == "__main__":
    main()
