"""Probe Mosaic support for the constructs the on-demand corr kernel needs.

Each probe is a tiny standalone pallas_call run on the real TPU backend and
checked against numpy. Mosaic failures here are opaque HTTP 500s, so probing
constructs one at a time is the only way to bisect (see CLAUDE.md gotchas).

Usage: python tools/probe_mosaic_ondemand.py [probe_name ...]
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT, C, Hl, Wl = 128, 256, 16, 128


def check(name, got, want, atol=2e-2):
    got = np.asarray(got)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"  {name}: rel_err={err:.2e} {'OK' if err < atol else 'FAIL'}")


def probe_dot_3d_rhs_last():
    """rows[q,h,w] = sum_c f1[q,c] * f2[h,w,c] — contract rhs LAST dim."""
    def kernel(f1_ref, f2_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            f1_ref[:], f2_ref[:],
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    f1 = jax.random.normal(jax.random.PRNGKey(0), (QT, C), jnp.float32)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (Hl, Wl, C), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QT, Hl, Wl), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(f1, f2)
    want = np.einsum("qc,hwc->qhw", np.asarray(f1), np.asarray(f2))
    check("dot_3d_rhs_last", out, want)


def probe_dot_3d_rhs_first():
    """rows[q,h,w] = sum_c f1[q,c] * f2t[c,h,w] — contract rhs FIRST dim."""
    def kernel(f1_ref, f2_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            f1_ref[:], f2_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    f1 = jax.random.normal(jax.random.PRNGKey(0), (QT, C), jnp.float32)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (C, Hl, Wl), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QT, Hl, Wl), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(f1, f2)
    want = np.einsum("qc,chw->qhw", np.asarray(f1), np.asarray(f2))
    check("dot_3d_rhs_first", out, want)


def probe_rows_loop_h():
    """rows built as a fori_loop of [QT,C]x[C,Wl] matmuls with dynamic sublane write."""
    def kernel(f1_ref, f2_ref, out_ref):
        def body(h, _):
            out_ref[:, h, :] = jnp.dot(
                f1_ref[:], f2_ref[h], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, Hl, body, 0)

    f1 = jax.random.normal(jax.random.PRNGKey(0), (QT, C), jnp.float32)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (Hl, C, Wl), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QT, Hl, Wl), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(f1, f2)
    want = np.einsum("qc,hcw->qhw", np.asarray(f1), np.asarray(f2))
    check("rows_loop_h", out, want)


def probe_hbm_scratch_dma():
    """f2 stays in HBM; kernel DMAs it into VMEM scratch once (grid step 0)."""
    def kernel(f1_ref, f2_hbm, out_ref, f2_vmem, sem):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dma = pltpu.make_async_copy(f2_hbm, f2_vmem, sem)
            dma.start()
            dma.wait()

        out_ref[:] = jnp.dot(
            f1_ref[:], f2_vmem[:], preferred_element_type=jnp.float32
        )

    f1 = jax.random.normal(jax.random.PRNGKey(0), (2 * QT, C), jnp.float32)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (C, Wl), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((QT, C), lambda q: (q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((QT, Wl), lambda q: (q, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * QT, Wl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, Wl), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(f1, f2)
    want = np.asarray(f1) @ np.asarray(f2)
    check("hbm_scratch_dma", out, want)


def probe_accum_output():
    """Output block revisited across grid steps (zero-init + accumulate)."""
    def kernel(x_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += x_ref[:]

    x = jax.random.normal(jax.random.PRNGKey(0), (4, QT, Wl), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, QT, Wl), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, QT, Wl), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, QT, Wl), jnp.float32),
    )(x)
    check("accum_output", out[0], np.asarray(x).sum(0))


def probe_dot_2d_contract():
    """df1[q,c] = sum_{h,w} d_rows[q,h,w] * f2[h,w,c] — contract two dims."""
    def kernel(dr_ref, f2_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            dr_ref[:], f2_ref[:],
            dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dr = jax.random.normal(jax.random.PRNGKey(0), (QT, Hl, Wl), jnp.float32)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (Hl, Wl, C), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((QT, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(dr, f2)
    want = np.einsum("qhw,hwc->qc", np.asarray(dr), np.asarray(f2))
    check("dot_2d_contract", out, want)


def probe_dot_contract_q():
    """df2[h,w,c] = sum_q d_rows[q,h,w] * f1[q,c] — contract lhs FIRST dim."""
    def kernel(dr_ref, f1_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            dr_ref[:], f1_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dr = jax.random.normal(jax.random.PRNGKey(0), (QT, Hl, Wl), jnp.float32)
    f1 = jax.random.normal(jax.random.PRNGKey(1), (QT, C), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hl, Wl, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(dr, f1)
    want = np.einsum("qhw,qc->hwc", np.asarray(dr), np.asarray(f1))
    check("dot_contract_q", out, want)


PROBES = {
    "dot_3d_rhs_last": probe_dot_3d_rhs_last,
    "dot_3d_rhs_first": probe_dot_3d_rhs_first,
    "rows_loop_h": probe_rows_loop_h,
    "hbm_scratch_dma": probe_hbm_scratch_dma,
    "accum_output": probe_accum_output,
    "dot_2d_contract": probe_dot_2d_contract,
    "dot_contract_q": probe_dot_contract_q,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        print(f"probe {n}:")
        try:
            PROBES[n]()
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"  {n}: EXC {type(e).__name__}: {msg}")
