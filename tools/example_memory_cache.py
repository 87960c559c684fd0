"""Preload-cache benchmark: cache vs no-cache sample read timing.

Parity role: `example_memory_cache.py:19-62` (which called get_cache_info /
clear_cache that the reference never implemented — they exist here,
`data/datasets.py`). Builds a small synthetic Sintel-style dataset when no real
one is given.

Usage: python tools/example_memory_cache.py [--root datasets/Sintel] [--n 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None, help="Sintel root; synthetic if absent")
    p.add_argument("--n", type=int, default=50, help="samples per timing pass")
    args = p.parse_args()

    from raft_optical_flow_tpu.data.datasets import MpiSintel

    root = args.root
    if root is None or not os.path.isdir(root):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        from test_data_layer import _make_mini_sintel

        root = "/tmp/cache_example_sintel"
        if not os.path.exists(root):
            _make_mini_sintel(root, scenes=("alley_9", "ambush_2"), frames=8,
                              hw=(128, 192))
        print(f"(no real dataset; using synthetic set at {root})")

    aug = {"crop_size": (96, 128), "min_scale": -0.2, "max_scale": 0.2,
           "do_flip": True}

    def timed_pass(ds, n):
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        for i in range(n):
            ds.__getitem__(i % len(ds), rng=rng)
        return time.perf_counter() - t0

    ds = MpiSintel(aug, root=root, dstype="clean")
    cold = timed_pass(ds, args.n)
    print(f"no cache:   {args.n} samples in {cold:.3f}s "
          f"({1e3 * cold / args.n:.2f} ms/sample)")

    ds.preload_all()
    info = ds.get_cache_info()
    print(f"preloaded {info['cached']} samples ({info['bytes'] / 1e6:.1f} MB)")
    warm = timed_pass(ds, args.n)
    print(f"with cache: {args.n} samples in {warm:.3f}s "
          f"({1e3 * warm / args.n:.2f} ms/sample)  speedup {cold / warm:.2f}x")
    ds.clear_cache()
    assert ds.get_cache_info()["cached"] == 0


if __name__ == "__main__":
    main()
