"""Gradient-parity checks for the correlation custom-VJP kernels.

Shared by the automated bench gate (`bench.py::fidelity_check`) and the
manual on-TPU tool (`tools/verify_grad_tpu.py`): each check runs one
`jax.grad` of a scalarized lookup through a Pallas custom-VJP path and
compares the feature gradients against the XLA oracle computed on the same
backend. This guards the backward half of the `alt_cuda_corr` parity
contract (`/root/reference/alt_cuda_corr/correlation_kernel.cu:123-256` — a
backward that actually runs on its hardware): a Mosaic regression in any
backward kernel fails the driver's bench capture instead of shipping
silently.

Shapes are deliberately small (24x32 grid) so the whole suite adds ~1 s of
compile+run to the gate; the kernels' grid/tiling logic is shape-generic and
exercised identically at these sizes (ceil-div grids, partial final blocks,
both resident and h-streaming on-demand modes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# fp32 custom-VJP kernels vs the fp32 XLA oracle: agreement is limited only
# by contraction order, ~1e-6 relative in practice; 2e-5 is a loose bound
# that still catches any real kernel defect (wrong tap, dropped level, ...).
DEFAULT_TOL = 2e-5


def _max_rel(d, ref) -> float:
    scale = float(jnp.max(jnp.abs(ref))) + 1e-12
    return float(jnp.max(jnp.abs(d))) / scale


def check_lookup_grad(B=1, h=24, w=32, radius=4, levels=4, interpret=False,
                      volume_dtype=jnp.float32):
    """kernels/corr_lookup.py VJP vs ops/corr.py XLA grads, on this backend.

    volume_dtype=bfloat16 exercises the mixed-precision fast path
    (bf16 cotangent + DEFAULT-precision selector contractions + bf16 dcorr,
    kernels/corr_lookup.py:_lookup_level_bwd) against the fp32 oracle on the
    SAME bf16-valued inputs — the comparison then measures only the kernel's
    extra bf16 roundings (cotangent emit + two contraction passes), which is
    exactly what the looser bf16 tolerance budgets for.
    """
    from raft_optical_flow_tpu.kernels.corr_lookup import corr_pyramid_lookup_pallas
    from raft_optical_flow_tpu.ops.corr import corr_pyramid_lookup

    rng = np.random.default_rng(0)
    Q = h * w
    # values quantized to the volume dtype so both paths see identical inputs
    pyr = tuple(
        jnp.asarray(
            rng.normal(size=(B, Q, h // 2**l, w // 2**l)).astype(np.float32)
        ).astype(volume_dtype)
        for l in range(levels)
    )
    coords = jnp.asarray(
        rng.uniform(1, min(h, w) - 2, size=(B, h, w, 2)).astype(np.float32)
    )
    cot = jnp.asarray(
        rng.normal(size=(B, h, w, levels * (2 * radius + 1) ** 2)).astype(np.float32)
    ).astype(volume_dtype)

    def loss_pallas(p):
        out = corr_pyramid_lookup_pallas(
            p, coords, radius, interpret=interpret, out_dtype=volume_dtype
        )
        return jnp.vdot(out.astype(jnp.float32), cot.astype(jnp.float32))

    def loss_xla(p):
        # fp32 oracle on the same (dtype-quantized) values
        p32 = tuple(x.astype(jnp.float32) for x in p)
        return jnp.vdot(corr_pyramid_lookup(p32, coords, radius),
                        cot.astype(jnp.float32))

    # jit on hardware (op-by-op dispatch through the tunnel would dominate);
    # NOT under the interpreter — jit of the interpreted kernel inlines the
    # python grid loop into the trace and compile time explodes
    wrap = (lambda f: f) if interpret else jax.jit
    g1 = wrap(jax.grad(loss_pallas))(pyr)
    g2 = wrap(jax.grad(loss_xla))(pyr)
    return max(
        _max_rel(a.astype(jnp.float32) - b.astype(jnp.float32),
                 b.astype(jnp.float32))
        for a, b in zip(g1, g2)
    )


def check_ondemand_grad(B=1, h=24, w=32, C=64, radius=4, levels=2, stream=False,
                        interpret=False):
    """kernels/corr_ondemand_pallas.py VJP (df1+df2) vs the XLA oracle.

    stream=True shrinks the residency budget so every level takes the
    h-streaming kernels (the large-frame code path).
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

        wrap = (lambda f: f) if interpret else jax.jit  # see check_lookup_grad
        g1 = wrap(jax.grad(loss_pallas, argnums=(0, 1)))(f1, f2s)
        g2 = wrap(jax.grad(loss_xla, argnums=(0, 1)))(f1, f2s)
    finally:
        kp._RESIDENT_BUDGET = old
    rels = [_max_rel(g1[0] - g2[0], g2[0])]
    rels += [_max_rel(a - b, b) for a, b in zip(g1[1], g2[1])]
    return max(rels)


def run_all(interpret=None, tol=DEFAULT_TOL):
    """All three backward paths; returns {name: {max_rel, ok}}.

    interpret=None auto-selects: real Mosaic compile on TPU (the point of the
    gate), Pallas interpreter on CPU (smoke/tests — `interpret=False` on the
    CPU backend would attempt a Mosaic compile that cannot succeed there).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # The Pallas interpreter executes grid steps in Python — at the compiled
    # gate's 24x32 shapes a single backward takes >10 min on this box's one
    # CPU core. Interpret smoke runs the same kernel logic (multi-tile
    # ceil-div grids, both on-demand modes) at the test-suite's scale.
    lk = dict(h=12, w=16, levels=3) if interpret else {}
    od = dict(h=12, w=16, C=32) if interpret else {}
    # bf16 budget: the fast path adds three bf16 roundings on top of the
    # fp32 oracle (cotangent emit, dcorr emit, DEFAULT-truncated selector
    # operands); each is <= 2^-8 relative, and the fp32-accumulated
    # contractions don't compound them — 3e-2 on a max-relative metric is
    # ~8x slack over the roundings while still catching any structural
    # defect (wrong tap / dropped level shows up at O(1)).
    BF16_TOL = 3e-2
    results = {}
    for name, fn, t in (
        ("lookup_vjp",
         lambda: check_lookup_grad(interpret=interpret, **lk), tol),
        ("lookup_vjp_bf16",
         lambda: check_lookup_grad(interpret=interpret,
                                   volume_dtype=jnp.bfloat16, **lk), BF16_TOL),
        ("ondemand_vjp",
         lambda: check_ondemand_grad(stream=False, interpret=interpret, **od),
         tol),
        ("ondemand_vjp_stream",
         lambda: check_ondemand_grad(stream=True, interpret=interpret, **od),
         tol),
    ):
        rel = fn()
        results[name] = {"max_rel": float(rel), "ok": bool(rel < t)}
    return results
