"""Fused norm1 -> qkv-projection -> attention (VERDICT r4 lever 1(b)).

The round-4 profile attributes 5.14 ms/step to LN-adjacent reduce fusions
(PARITY.md "Profile attribution"). The round-2 standalone Pallas LayerNorm
lost end-to-end because its custom_vjp boundary forfeited the LN <-> matmul
fusion XLA was doing (31.54 -> 33.62 ms, the measured dead end in
ops/pallas/layernorm.py). This module extends the EXISTING flat-attention
custom boundary (ops/pallas/attention.py — kernel I/O at the qkv Dense
output) upstream through norm1, adding **no new custom_vjp boundary**:

  forward:  F1 kernel  x --LN--> xn --GEMM--> qkv   (one pass: the LN
            statistics, the affine and the [C,3C] projection never touch
            HBM separately)
            F2 kernel  = the proven flat attention forward on qkv
  backward: B1 kernel  = the proven flat attention backward -> dqkv
            B2 kernel  dxn = dqkv @ W^T fused with the one-pass LN
            backward -> dx, plus per-batch dscale/dbias partials and the
            recomputed xn (emitted for the XLA dW GEMM)
            XLA:       dW = xn^T @ dqkv, db = sum(dqkv) — left OUTSIDE the
            kernels on purpose so XLA keeps fusing the optimizer epilogue
            into the dW GEMM exactly as in the unfused graph.

Numerics: LN runs in fp32 with flax's fast-variance formula
(``var = E[x^2] - E[x]^2``), affine in fp32, then one cast to the compute
dtype feeding the GEMM, and the bias added in the output dtype AFTER
the accumulator cast — matching ``nn.LayerNorm(dtype=f32)`` ->
``.astype(dtype)`` -> ``nn.Dense``'s exact rounding order.
Reference semantics: pre-norm block, models/passt.py:364-380.

Geometry gating mirrors attention.py: analytic VMEM estimates anchored to
measured compile frontiers (budgets below); anything past the budget runs
the unfused module path instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from passt_tpu.ops.pallas.attention import (
    _flat_attn_bwd,
    _flat_attn_fwd,
    flat_kernel_supports,
)

#: VMEM budgets for the two new kernels (double-buffered [1, N, *] blocks +
#: the resident [C, 3C] weight + fp32 LN temporaries; the qkv GEMM runs in
#: 3 column chunks so its fp32 accumulator is [N, C] not [N, 3C]).
#: At the flagship train geometry (N=474, C=768, bf16) the estimates are
#: F1 13.1 MB / B2 15.9 MB — B2 leans on Mosaic reusing the xhat/dxn fp32
#: temporaries rather than keeping all three live (the [1, N, *] block
#: double-buffers alone are 10.2 MB). Anchored by the real-chip run of
#: scripts/ab_ln_qkv.py; re-tighten if a new geometry OOMs.
_F1_BUDGET = 14 * 1024 * 1024
_B2_BUDGET = 16 * 1024 * 1024


def _f1_bytes(n: int, c: int, itemsize: int) -> int:
    blocks = 2 * n * (c + 3 * c) * itemsize  # x in + qkv out, double-buffered
    w = c * 3 * c * itemsize
    temps = 2 * n * c * 4 + n * c * 4  # xf, xn fp32 + one [N, C] f32 accum
    return blocks + w + temps


def _b2_bytes(n: int, c: int, itemsize: int) -> int:
    # x + dqkv in, dx + xn out (double-buffered), weight, fp32 temps
    blocks = 2 * n * (c + 3 * c + c + c) * itemsize
    w = c * 3 * c * itemsize
    temps = 3 * n * c * 4  # xhat, dxn accum, dxhat
    return blocks + w + temps


def ln_qkv_supports(
    n: int, heads: int, head_dim: int, *, backward: bool, itemsize: int = 2,
    batch: Optional[int] = None,
) -> bool:
    """True iff the fused norm1+qkv+attention path fits this geometry —
    requires the flat attention kernel to fit (F2/B1 are exactly those
    kernels) AND the two new LN/GEMM kernels to fit their budgets."""
    if not flat_kernel_supports(
        n, heads, head_dim, backward=backward, itemsize=itemsize, batch=batch
    ):
        return False
    c = heads * head_dim
    if _f1_bytes(n, c, itemsize) > _F1_BUDGET:
        return False
    if backward and _b2_bytes(n, c, itemsize) > _B2_BUDGET:
        return False
    return True


def ln_stats(xf: jnp.ndarray, eps: float):
    """fp32 fast-variance LN statistics (flax nn.LayerNorm defaults:
    ``var = max(0, E[x^2] - E[x]^2)``). THE single implementation — the
    fused kernels, the stacked-blocks stack, and the module-path inline
    fallback all import this so the formula cannot drift.

    The max(0, ...) clamp is load-bearing, not defensive: on a
    near-constant large-magnitude row (x = 120 + N(0, 1e-3) at C=768)
    fp32 cancellation makes the unclamped fast variance NEGATIVE beyond
    eps and rsqrt returns NaN — flax clamps (nn._compute_stats), and so
    does ops/pallas/layernorm.py (round-5 review finding, verified by
    execution)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    rstd = jax.lax.rsqrt(var + jnp.float32(eps))
    return mu, rstd


_CHUNKS = 3  # qkv column chunks: keeps the fp32 GEMM accumulator at [N, C]


def _f1_kernel(x_ref, s_ref, b_ref, w_ref, wb_ref, qkv_ref, *, eps, precision):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu, rstd = ln_stats(xf, eps)
    xn = (xf - mu) * rstd * s_ref[0].astype(jnp.float32) + b_ref[0].astype(
        jnp.float32
    )
    xn_c = xn.astype(x.dtype)
    c3 = w_ref.shape[1]
    step = c3 // _CHUNKS
    for j in range(_CHUNKS):
        acc = jax.lax.dot_general(
            xn_c, w_ref[:, j * step : (j + 1) * step],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        # nn.Dense rounding order: the dot's bf16 output + bf16 bias
        # (two roundings), NOT fp32-accum + fp32 bias rounded once —
        # keeps the fused path bit-identical to the module path.
        qkv_ref[0, :, j * step : (j + 1) * step] = acc.astype(
            qkv_ref.dtype
        ) + wb_ref[0, j * step : (j + 1) * step].astype(qkv_ref.dtype)


def _b2_kernel(
    x_ref, dqkv_ref, w_ref, s_ref, b_ref, dx_ref, xn_ref, dsc_ref, dbi_ref,
    *, eps, precision,
):
    xf = x_ref[0].astype(jnp.float32)
    mu, rstd = ln_stats(xf, eps)
    xhat = (xf - mu) * rstd  # [N, C] fp32
    s = s_ref[0].astype(jnp.float32)
    xn_ref[0] = (xhat * s + b_ref[0].astype(jnp.float32)).astype(xn_ref.dtype)

    c = x_ref.shape[-1]
    c3 = w_ref.shape[1]
    step = c3 // _CHUNKS
    dxn = None  # dqkv @ W^T, accumulated over column chunks
    for j in range(_CHUNKS):
        sl = slice(j * step, (j + 1) * step)
        part = jax.lax.dot_general(
            dqkv_ref[0, :, sl], w_ref[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        dxn = part if dxn is None else dxn + part

    dsc_ref[0, 0] = jnp.sum(dxn * xhat, axis=0)
    dbi_ref[0, 0] = jnp.sum(dxn, axis=0)

    dxhat = dxn * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _row_spec(n, c, count):
    spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0))
    return [spec] * count


def _const2(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0))


def _f1_call(x, s, b, w, wb, eps, interpret):
    bsz, n, c = x.shape
    c3 = w.shape[1]
    prec = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(x.dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(_f1_kernel, eps=eps, precision=prec)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            _row_spec(n, c, 1)[0],
            _const2((1, c)),
            _const2((1, c)),
            _const2((c, c3)),
            _const2((1, c3)),
        ],
        out_specs=_row_spec(n, c3, 1)[0],
        out_shape=jax.ShapeDtypeStruct((bsz, n, c3), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * c * c3,
            bytes_accessed=(bsz * n * (c + c3) + c * c3) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, s.reshape(1, c), b.reshape(1, c), w, wb.reshape(1, c3))


def _b2_call(x, dqkv, w, s, b, eps, interpret):
    bsz, n, c = x.shape
    c3 = w.shape[1]
    prec = (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(x.dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    kernel = functools.partial(_b2_kernel, eps=eps, precision=prec)
    dx, xn, dsc, dbi = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            _row_spec(n, c, 1)[0],
            _row_spec(n, c3, 1)[0],
            _const2((c, c3)),
            _const2((1, c)),
            _const2((1, c)),
        ],
        out_specs=(
            _row_spec(n, c, 1)[0],
            _row_spec(n, c, 1)[0],
            # [B, 1, C] partials: Mosaic's block rule needs the LAST TWO
            # block dims divisible by (8, 128) or equal to the array dims —
            # a (1, C) block over [B, C] has sublane 1 != B; the extra unit
            # axis makes the trailing dims (1, C) == (1, C).
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
            jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * c * c3,
            bytes_accessed=(bsz * n * (2 * c + c3) + c * c3) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, dqkv, w, s.reshape(1, c), b.reshape(1, c))
    return dx, xn, dsc, dbi


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def ln_qkv_attention(
    x, ln_scale, ln_bias, w, wb, heads, head_dim, att_scale, plus1, eps, interpret
):
    return _ln_qkv_attn_fwd(
        x, ln_scale, ln_bias, w, wb, heads, head_dim, att_scale, plus1, eps,
        interpret,
    )[0]


def _ln_qkv_attn_fwd(
    x, ln_scale, ln_bias, w, wb, heads, head_dim, att_scale, plus1, eps, interpret
):
    qkv = _f1_call(x, ln_scale, ln_bias, w, wb, eps, interpret)
    o, _ = _flat_attn_fwd(qkv, heads, head_dim, att_scale, plus1, interpret)
    return o, (x, ln_scale, ln_bias, w, qkv)


def _ln_qkv_attn_bwd(heads, head_dim, att_scale, plus1, eps, interpret, res, do):
    x, ln_scale, ln_bias, w, qkv = res
    (dqkv,) = _flat_attn_bwd(
        heads, head_dim, att_scale, plus1, interpret, (qkv,), do
    )
    b, n, c = x.shape
    if _b2_bytes(n, c, x.dtype.itemsize) > _B2_BUDGET:
        # Reachable by differentiating through an eval-selected forward
        # (the module gates on backward=train, which only checks the F1
        # budget): recompute the same math as plain XLA ops — slower,
        # never wrong (same contract as attention.py's bwd fallback).
        sf = ln_scale.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        mu, rstd = ln_stats(xf, eps)
        xhat = (xf - mu) * rstd
        xn_f = xhat * sf + ln_bias.astype(jnp.float32)
        dxn = jnp.einsum(
            "bnk,ck->bnc", dqkv.astype(jnp.float32), w.astype(jnp.float32)
        )
        # [B, 1, C] partials, same layout as the kernel outputs
        dsc_p = jnp.sum(dxn * xhat, axis=1, keepdims=True)
        dbi_p = jnp.sum(dxn, axis=1, keepdims=True)
        dxhat = dxn * sf
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
        xn = xn_f.astype(x.dtype)
    else:
        dx, xn, dsc_p, dbi_p = _b2_call(
            x, dqkv, w, ln_scale, ln_bias, eps, interpret
        )
    # dW / db stay in XLA: the dW GEMM keeps its optimizer-epilogue fusion
    # (moving it in-kernel would re-fight the round-3 per-leaf dead end).
    dw = jax.lax.dot_general(
        xn, dqkv,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1)).astype(w.dtype)
    return (
        dx,
        jnp.sum(dsc_p, axis=(0, 1)).astype(ln_scale.dtype),
        jnp.sum(dbi_p, axis=(0, 1)).astype(ln_bias.dtype),
        dw,
        db,
    )


ln_qkv_attention.defvjp(_ln_qkv_attn_fwd, _ln_qkv_attn_bwd)


def fused_ln_qkv_attention(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    qkv_kernel: jnp.ndarray,
    qkv_bias: jnp.ndarray,
    *,
    heads: int,
    head_dim: int,
    scale: float,
    plus1: bool = False,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """norm1 -> qkv Dense -> attention, fused (see module docstring).

    Args:
      x: ``[B, N, C]`` residual-stream input (PRE-norm1), compute dtype.
      ln_scale, ln_bias: ``[C]`` LayerNorm affine (fp32 params).
      qkv_kernel: ``[C, 3*heads*head_dim]`` fused qkv Dense kernel
        (reference column order ``(qkv, head, dim)``).
      qkv_bias: ``[3*heads*head_dim]``.
      scale: attention score scale (``head_dim ** -0.5``).

    Returns:
      ``[B, N, C]`` attention output (the proj Dense input), x.dtype.
    """
    if qkv_kernel.shape[-1] != 3 * heads * head_dim:
        raise ValueError(
            f"qkv kernel out dim {qkv_kernel.shape[-1]} != 3*{heads}*{head_dim}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = x.dtype
    return ln_qkv_attention(
        x,
        ln_scale,
        ln_bias,
        qkv_kernel.astype(dt),
        qkv_bias.astype(dt),
        heads,
        head_dim,
        float(scale),
        bool(plus1),
        float(eps),
        interpret,
    )
