"""Fused SepConvGRU Pallas kernel (VERDICT round-2 item 7 experiment).

Parity target: `core/update.py:74-121` (SepConvGRU) — a horizontal pass of three
1x5 gate convs followed by a vertical pass of three 5x1 gate convs:

    z = sigmoid(convz(cat(h, x)));  r = sigmoid(convr(cat(h, x)))
    q = tanh(convq(cat(r * h, x)));  h = (1 - z) * h + z * q

Kernel design: each pass is ONE pallas_call that keeps the block of h and x
VMEM-resident and computes all three gates without writing any intermediate to
HBM. A kx1/1xk conv is expressed as k shifted matmuls (static slice +
zero-concat + dot_general); cat(h, x) never materializes because every gate weight is
split along its input dim into an h-part and an x-part (conv(cat(a,b), W) ==
conv(a, W_a) + conv(b, W_b)). The horizontal kernel blocks full rows (the 1x5
window never crosses a block); the vertical kernel blocks full columns.

XLA's separate-conv lowering reads h/x (and r*h) from HBM once per gate conv
plus elementwise passes for the gate math — roughly 3x the minimal traffic this
kernel does. Measured in-model delta: see BENCH.md.

Gradients: custom_vjp whose backward differentiates the XLA reference
implementation (`sepconv_gru_reference`) — the fused kernel is a forward-path
(inference) optimization; training keeps XLA autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _shifted(x, offset: int, axis: int):
    """x advanced by `offset` along `axis` (out[i] = x[i + offset]),
    zero-filled past the edges."""
    if offset == 0:
        return x
    # static slice + zero-fill concat along the (non-lane) spatial axis;
    # pltpu.roll only rotates 32-bit data, so it can't shift bf16 blocks
    pads = [(0, 0)] * x.ndim
    idx = [slice(None)] * x.ndim
    if offset > 0:
        idx[axis] = slice(offset, None)
        pads[axis] = (0, offset)
    else:
        idx[axis] = slice(None, offset)
        pads[axis] = (-offset, 0)
    zeros_shape = list(x.shape)
    zeros_shape[axis] = abs(offset)
    zeros = jnp.zeros(zeros_shape, x.dtype)
    pieces = (x[tuple(idx)], zeros) if offset > 0 else (zeros, x[tuple(idx)])
    return jnp.concatenate(pieces, axis=axis)


def _gate_conv(h, x, wk_h, wk_x, bias, axis: int, radius: int):
    """sum_o shifted(h, o) @ wk_h[o] + shifted(x, o) @ wk_x[o] + bias.

    h: [.., D]; x: [.., X]; wk_h: [K, D, O]; wk_x: [K, X, O]. The contraction
    runs per tap so only one shifted copy is live at a time.
    """
    acc = None
    for o in range(-radius, radius + 1):
        k = o + radius
        part = jax.lax.dot_general(
            _shifted(h, o, axis), wk_h[k],
            dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        part = part + jax.lax.dot_general(
            _shifted(x, o, axis), wk_x[k],
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc + bias.astype(jnp.float32)


def _gru_pass_kernel(h_ref, x_ref, wz_h, wz_x, bz, wr_h, wr_x, br,
                     wq_h, wq_x, bq, out_ref, *, axis: int, radius: int):
    """One directional GRU pass on a VMEM block.

    h_ref: [1, R, W, D]; x_ref: [1, R, W, X]; weights [K, C, D] with the spatial
    tap leading; axis: 1 (vertical, 5x1) or 2 (horizontal, 1x5) in block coords.
    """
    h = h_ref[0]
    x = x_ref[0]
    ax = axis - 1  # block dims drop the leading 1
    dtype = h.dtype

    z = jax.nn.sigmoid(
        _gate_conv(h, x, wz_h[...], wz_x[...], bz[...], ax, radius)
    )
    r = jax.nn.sigmoid(
        _gate_conv(h, x, wr_h[...], wr_x[...], br[...], ax, radius)
    )
    rh = (r.astype(dtype) * h)
    q = jnp.tanh(
        _gate_conv(rh, x, wq_h[...], wq_x[...], bq[...], ax, radius)
    )
    out = (1.0 - z) * h.astype(jnp.float32) + z * q
    out_ref[0] = out.astype(out_ref.dtype)


def _split_weights(kernel, d: int):
    """[kh, kw, D+X, O] conv kernel -> ([K, D, O], [K, X, O]) with the spatial
    window flattened onto the leading tap axis (1x5 or 5x1: kh*kw == K)."""
    kh, kw, cin, out = kernel.shape
    k = kernel.reshape(kh * kw, cin, out)
    return k[:, :d, :], k[:, d:, :]


def sepconv_gru_reference(h, x, params):
    """XLA reference of the same math (used for parity tests and the VJP)."""
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(inp, kernel, bias, pad):
        num = jax.lax.conv_dimension_numbers(inp.shape, kernel.shape, dn)
        return jax.lax.conv_general_dilated(
            inp.astype(kernel.dtype), kernel, (1, 1), pad, dimension_numbers=num
        ) + bias

    for suffix, pad in (("1", ((0, 0), (2, 2))), ("2", ((2, 2), (0, 0)))):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(conv(hx, *params["convz" + suffix], pad))
        r = jax.nn.sigmoid(conv(hx, *params["convr" + suffix], pad))
        q = jnp.tanh(
            conv(jnp.concatenate([r * h, x], axis=-1), *params["convq" + suffix], pad)
        )
        h = (1 - z) * h + z * q
    return h


def _rows_block(H: int) -> int:
    for r in (8, 4, 2, 1):
        if H % r == 0:
            return r
    return 1


def _cols_block(W: int) -> int:
    # small enough that the fp32 gate intermediates of a full-height block fit
    # the 16 MB scoped-vmem budget at Sintel size. The grid is ceil-div with a
    # masked partial final block (columns are independent in the vertical
    # pass — the 5x1 window never crosses columns — so the padding lanes of a
    # partial block compute garbage that Pallas drops on write), which avoids
    # the old exact-divisor fallback: for prime widths that degenerated to a
    # 1-wide block padded ~32x in VMEM.
    return min(W, 32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sepconv_gru_pallas(h, x, params, interpret=False):
    """Fused SepConvGRU: h, x [B, H, W, C]; params dict of 6 (kernel, bias)
    pairs named convz1/convr1/convq1 (1x5) and convz2/convr2/convq2 (5x1),
    kernels in HWIO layout over cat(h, x). Returns the updated hidden state."""
    return _sepconv_gru_fwd_impl(h, x, params, interpret)


def _sepconv_gru_fwd_impl(h, x, params, interpret):
    B, H, W, D = h.shape
    X = x.shape[-1]
    radius = 2
    K = 2 * radius + 1

    def run_pass(h_in, suffix, axis):
        weights = []
        for gate in ("z", "r", "q"):
            kernel, bias = params["conv" + gate + suffix]
            wk_h, wk_x = _split_weights(kernel.astype(h_in.dtype), D)
            weights += [wk_h, wk_x, bias]
        if axis == 2:  # horizontal: full rows per block
            R = _rows_block(H)
            grid = (B, H // R)
            blk = lambda c: pl.BlockSpec((1, R, W, c), lambda b, i: (b, i, 0, 0))
        else:  # vertical: full columns per block (ceil-div; partial final
            # block OK — columns are independent under the 5x1 window)
            C = _cols_block(W)
            grid = (B, pl.cdiv(W, C))
            blk = lambda c: pl.BlockSpec((1, H, C, c), lambda b, i: (b, 0, i, 0))
        w_specs = [pl.BlockSpec(w.shape, lambda b, i, n=w.ndim: (0,) * n)
                   for w in weights]
        return pl.pallas_call(
            functools.partial(_gru_pass_kernel, axis=axis, radius=radius),
            grid=grid,
            in_specs=[blk(D), blk(X)] + w_specs,
            out_specs=blk(D),
            out_shape=jax.ShapeDtypeStruct(h_in.shape, h_in.dtype),
            interpret=interpret,
        )(h_in, x, *weights)

    h1 = run_pass(h, "1", axis=2)
    return run_pass(h1, "2", axis=1)


def _sepconv_gru_fwd(h, x, params, interpret):
    return _sepconv_gru_fwd_impl(h, x, params, interpret), (h, x, params)


def _sepconv_gru_bwd(interpret, residuals, g):
    h, x, params = residuals
    _, vjp = jax.vjp(sepconv_gru_reference, h, x, params)
    return vjp(g.astype(h.dtype))


sepconv_gru_pallas.defvjp(_sepconv_gru_fwd, _sepconv_gru_bwd)
