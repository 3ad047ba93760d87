"""Int8 quantized Dense (AQT-style) as a fused Pallas TPU kernel.

Motivation (measured, scripts/int8_matmul_micro.py on the v5e chip): XLA's
own int8 ``dot`` delivers only ~1.06x its bf16 rate, but a custom Mosaic
matmul reaches **345 TOP/s at 8192^3 and 282 TOP/s at the model's qkv
shape** — 1.8x / 1.6x the same kernel structure in bf16 and ~1.5x the best
XLA bf16 rate at model shapes. This module turns that into a usable layer:

    y = dequant( Q8(x) @ Q8(w) ) + b        (+ optional fused tanh-GELU)

- activations: symmetric per-ROW int8 (scale = absmax/127 per example row
  — scales live on the non-contracted dim, so dequant is exact w.r.t. the
  quantized product),
- weights: symmetric per-OUTPUT-CHANNEL int8,
- the int32 accumulator is dequantized, biased, and (for the MLP fc1)
  pushed through the tanh-GELU epilogue *inside the kernel*, emitting both
  gelu(z) and gelu'(z) — the same residual contract as
  :func:`passt_tpu.ops.activations.tanh_gelu`, so the backward stays one
  multiply with zero transcendentals.

Training integration is straight-through (STE): the forward runs int8, the
backward computes exact bf16 gradients of the unquantized linearization
(standard AQT practice); quantization noise is treated as identity. Both
entry points carry a custom_vjp, so they are usable in train and eval.

Reference surface being accelerated: the ``Mlp`` / ``Attention`` Dense
matmuls (reference models/passt.py:271-290, 331-361) — the FLOP majority
of every PaSST block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = math.sqrt(2.0 / math.pi)
_A = 0.044715

# Rows per grid program. 128 keeps the worst block set (fc1: qw 2.25 MB +
# double-buffered h/d outputs + f32 epilogue temps at N=3072) near ~11 MB
# of VMEM; raising it is a measured-sweep decision, not a default.
_BLOCK_M = 128


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row int8: returns (q [M, K] int8, scale [M, 1] f32)
    with x ~= q * scale. Zero rows quantize to zeros with scale 1."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_cols(w: jnp.ndarray):
    """Symmetric per-output-channel int8 for a [K, N] weight: returns
    (q [K, N] int8, scale [1, N] f32)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dense_kernel(qx_ref, qw_ref, sx_ref, sw_ref, b_ref, out_ref, *, out_dtype):
    acc = jnp.dot(qx_ref[...], qw_ref[...], preferred_element_type=jnp.int32)
    z = acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...] + b_ref[...]
    out_ref[...] = z.astype(out_dtype)


def _dense_gelu_kernel(qx_ref, qw_ref, sx_ref, sw_ref, b_ref, h_ref, d_ref, *, out_dtype):
    acc = jnp.dot(qx_ref[...], qw_ref[...], preferred_element_type=jnp.int32)
    z = acc.astype(jnp.float32) * sx_ref[...] * sw_ref[...] + b_ref[...]
    t = jnp.tanh(_C * (z + _A * z * z * z))
    h_ref[...] = (0.5 * z * (1.0 + t)).astype(out_dtype)
    d_ref[...] = (
        0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * _C * (1.0 + 3.0 * _A * z * z)
    ).astype(out_dtype)


def _pad_rows(x, bm):
    m = x.shape[0]
    pad = (-m) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, m


def _call_quantized(x, w, b, *, gelu: bool, out_dtype, interpret, block_m=_BLOCK_M):
    """Shared driver: quantize (XLA), run the fused kernel over row blocks."""
    k, n = w.shape
    qx, sx = quantize_rows(x)
    qw, sw = quantize_cols(w)
    qx, m = _pad_rows(qx, block_m)
    sx, _ = _pad_rows(sx, block_m)
    mp = qx.shape[0]
    grid = (mp // block_m,)
    in_specs = [
        pl.BlockSpec((block_m, k), lambda i: (i, 0)),
        pl.BlockSpec((k, n), lambda i: (0, 0)),  # whole weight, fetched once
        pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
        pl.BlockSpec((1, n), lambda i: (0, 0)),
    ]
    bias2d = b.reshape(1, n).astype(jnp.float32)
    sw = sw.astype(jnp.float32)
    if gelu:
        out = pl.pallas_call(
            functools.partial(_dense_gelu_kernel, out_dtype=out_dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((block_m, n), lambda i: (i, 0)),
                pl.BlockSpec((block_m, n), lambda i: (i, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((mp, n), out_dtype),
                jax.ShapeDtypeStruct((mp, n), out_dtype),
            ),
            interpret=interpret,
        )(qx, qw, sx, sw, bias2d)
        return out[0][:m], out[1][:m]
    out = pl.pallas_call(
        functools.partial(_dense_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
    )(qx, qw, sx, sw, bias2d)
    return out[:m]


def _interpret_default():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# custom-VJP entry points (STE backward in bf16/XLA)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_dense(x, w, b):
    """``x @ w + b`` with an int8 forward and STE backward. 2-D ``x``."""
    return _call_quantized(
        x, w, b, gelu=False, out_dtype=x.dtype, interpret=_interpret_default()
    )


def _int8_dense_fwd(x, w, b):
    return int8_dense(x, w, b), (x, w, b)


def _int8_dense_bwd(res, g):
    x, w, b = res
    gf = g
    dx = jnp.dot(gf, w.T).astype(x.dtype)
    dw = jnp.dot(x.T, gf).astype(w.dtype)
    # db in b.dtype: the grad pytree must mirror the param pytree's
    # dtypes like dx/dw already do (round-5 review finding)
    db = jnp.sum(gf.astype(jnp.float32), axis=0).astype(b.dtype)
    return dx, dw, db


int8_dense.defvjp(_int8_dense_fwd, _int8_dense_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_dense_gelu(x, w, b):
    """``tanh_gelu(x @ w + b)`` with an int8 forward, the GELU fused into
    the kernel epilogue, and the saved-derivative backward (one multiply,
    zero transcendentals — the residual contract of
    :func:`passt_tpu.ops.activations.tanh_gelu`)."""
    h, _ = _call_quantized(
        x, w, b, gelu=True, out_dtype=x.dtype, interpret=_interpret_default()
    )
    return h


def _int8_dense_gelu_fwd(x, w, b):
    h, d = _call_quantized(
        x, w, b, gelu=True, out_dtype=x.dtype, interpret=_interpret_default()
    )
    return h, (x, w, b, d)


def _int8_dense_gelu_bwd(res, g):
    x, w, b, d = res
    gz = (g.astype(jnp.float32) * d.astype(jnp.float32)).astype(g.dtype)
    dx = jnp.dot(gz, w.T).astype(x.dtype)
    dw = jnp.dot(x.T, gz).astype(w.dtype)
    db = jnp.sum(gz.astype(jnp.float32), axis=0).astype(b.dtype)
    return dx, dw, db


int8_dense_gelu.defvjp(_int8_dense_gelu_fwd, _int8_dense_gelu_bwd)


def int8_dense_nd(x, w, b, *, gelu: bool = False):
    """Leading-batch wrapper: flattens all but the last dim (the module-side
    tensors are [B, N, C])."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    f = int8_dense_gelu if gelu else int8_dense
    y = f(x2, w, b)
    return y.reshape(*lead, w.shape[1])
