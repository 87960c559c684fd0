"""On-TPU gradient parity for the correlation custom-VJP kernels.

Thin CLI over `raft_optical_flow_tpu.utils.grad_parity` (the same checks the
automated bench gate runs): Pallas backward kernels (materialized lookup +
on-demand, resident and h-streaming) vs the XLA oracle on the same chip.
Exercises the lane-FLAT cotangent design (the kernels consume the gradient
exactly as the forward emits it, unflattening via placement transposes in
VMEM; see kernels/corr_lookup.py:_lookup_level_bwd_kernel).

Usage: python tools/verify_grad_tpu.py [--interpret]
Prints one JSON line per path with the max relative gradient delta; exits
nonzero if any path exceeds tolerance (fp32 paths ~1e-6 relative measured).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from raft_optical_flow_tpu.utils.grad_parity import run_all


def main():
    interpret = "--interpret" in sys.argv  # CPU smoke mode
    assert interpret or jax.default_backend() != "cpu", "run on the TPU backend"
    from bench import git_stamp  # repo root is on sys.path (insert above)

    print(json.dumps({"git_rev": git_stamp()}), flush=True)
    results = run_all(interpret=interpret)
    ok = True
    for name, res in results.items():
        print(json.dumps({"path": name, **res}), flush=True)
        ok &= res["ok"]
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
