"""On-TPU gradient parity for the correlation custom-VJP kernels.

Runs the Pallas backward kernels (materialized lookup + on-demand, resident
and h-streaming) on the real TPU and compares d(volume)/d(features) gradients
against the XLA oracle path computed on the same chip. This is the bwd
counterpart of tools/verify_fullres_tpu.py (fwd) — exercises the lane-FLAT
cotangent design (the kernels consume the gradient exactly as the forward
emits it, unflattening via placement transposes in VMEM; see
kernels/corr_lookup.py:_lookup_level_bwd_kernel).

Usage: python tools/verify_grad_tpu.py
Prints one JSON line per path with max/mean gradient deltas; exits nonzero if
any path exceeds tolerance (fp32 paths ~1e-5 relative).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _rel(d, ref):
    scale = float(jnp.max(jnp.abs(ref))) + 1e-12
    return float(jnp.max(jnp.abs(d))) / scale


def check_lookup(B=1, h=24, w=32, radius=4, levels=4, interpret=False):
    """kernels/corr_lookup.py VJP vs ops/corr.py XLA grads, on-chip."""
    from raft_optical_flow_tpu.kernels.corr_lookup import corr_pyramid_lookup_pallas
    from raft_optical_flow_tpu.ops.corr import corr_pyramid_lookup

    rng = np.random.default_rng(0)
    Q = h * w
    pyr = tuple(
        jnp.asarray(
            rng.normal(size=(B, Q, h // 2**l, w // 2**l)).astype(np.float32)
        )
        for l in range(levels)
    )
    coords = jnp.asarray(
        rng.uniform(1, min(h, w) - 2, size=(B, h, w, 2)).astype(np.float32)
    )
    cot = jnp.asarray(
        rng.normal(size=(B, h, w, levels * (2 * radius + 1) ** 2)).astype(np.float32)
    )

    def loss_pallas(p):
        return jnp.vdot(
            corr_pyramid_lookup_pallas(p, coords, radius, interpret=interpret), cot
        )

    def loss_xla(p):
        return jnp.vdot(corr_pyramid_lookup(p, coords, radius), cot)

    g1 = jax.jit(jax.grad(loss_pallas))(pyr)
    g2 = jax.jit(jax.grad(loss_xla))(pyr)
    rels = [_rel(a - b, b) for a, b in zip(g1, g2)]
    return {"path": "lookup_vjp", "max_rel": max(rels)}


def check_ondemand(B=1, h=24, w=32, C=64, radius=4, levels=2, stream=False,
                   interpret=False):
    """kernels/corr_ondemand_pallas.py VJP (df1+df2) vs the XLA oracle, on-chip.

    stream=True shrinks the residency budget so every level takes the
    h-streaming kernels.
    """
    import raft_optical_flow_tpu.kernels.corr_ondemand_pallas as kp
    from raft_optical_flow_tpu.kernels.corr_ondemand import _ondemand_xla

    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
    f2s = tuple(
        jnp.asarray(
            rng.normal(size=(B, h // 2**l, w // 2**l, C)).astype(np.float32)
        )
        for l in range(levels)
    )
    coords = jnp.asarray(
        rng.uniform(1, min(h, w) - 2, size=(B, h, w, 2)).astype(np.float32)
    )
    cot = jnp.asarray(
        rng.normal(size=(B, h, w, levels * (2 * radius + 1) ** 2)).astype(np.float32)
    )

    old = kp._RESIDENT_BUDGET
    if stream:
        kp._RESIDENT_BUDGET = 1  # force h-streaming on every level
    try:
        def loss_pallas(a, bs):
            return jnp.vdot(
                kp.ondemand_corr_pyramid_pallas(a, bs, coords, radius,
                                                interpret=interpret), cot
            )

        def loss_xla(a, bs):
            return jnp.vdot(_ondemand_xla(a, bs, coords, radius), cot)

        g1 = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(f1, f2s)
        g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(f1, f2s)
    finally:
        kp._RESIDENT_BUDGET = old
    rels = [_rel(g1[0] - g2[0], g2[0])]
    rels += [_rel(a - b, b) for a, b in zip(g1[1], g2[1])]
    return {
        "path": "ondemand_vjp" + ("_stream" if stream else ""),
        "max_rel": max(rels),
    }


def main():
    interpret = "--interpret" in sys.argv  # CPU smoke mode
    assert interpret or jax.default_backend() != "cpu", "run on the TPU backend"
    tol = 2e-5
    ok = True
    for res in (
        check_lookup(interpret=interpret),
        check_ondemand(stream=False, interpret=interpret),
        check_ondemand(stream=True, interpret=interpret),
    ):
        res["ok"] = res["max_rel"] < tol
        ok &= res["ok"]
        print(json.dumps(res), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
