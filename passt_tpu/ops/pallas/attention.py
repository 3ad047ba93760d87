"""Fused Pallas TPU attention for PaSST's short-sequence regime.

The reference computes attention as materialized ``softmax(QK^T) @ V``
(reference: models/passt.py:331-361). At PaSST's sequence lengths
(N = 474 train / 1190 eval — *not* the 8k+ regime flash attention targets)
the [N, N] score matrix fits comfortably in VMEM, so the right TPU kernel
is the opposite of flash attention: **no KV tiling, no online softmax, no
residuals**. One grid program per (batch, head)

  - computes the full [N, N] fp32 score matrix in VMEM,
  - takes a plain (single-pass max/exp/sum) softmax,
  - multiplies into V — never spilling scores to HBM,

and the backward kernel **recomputes** the scores from Q/K instead of
round-tripping the softmax output through HBM. That round trip is where
the XLA autodiff path pays: it saves 12 blocks x [B*H, N, N] softmax
matrices in the forward and reads them back (plus materializing dS between
the dQ/dK matmuls) in the backward — O(B*H*N^2) HBM traffic that this
kernel eliminates entirely. The generic flash kernel was measured ~9x
slower than XLA at this N (PARITY.md "Measured dead ends"): its
small-block online-softmax machinery solves a problem PaSST does not have.

Numerics: scores/softmax are always fp32 (the module's ``softmax_fp32``
semantics); the probability matrix is cast to the input dtype for the PV
matmul, which accumulates in fp32. The "+1 trick" (``plus1_attn``,
reference passt.py:295+349-355) is one extra denominator term
``exp(-m)`` in the forward; the backward formula is unchanged because the
appended zero-logit column is constant (its dp contribution is 0).

The backward needs no residuals at all — softmax statistics are
recomputed bit-identically from the same fp32 scores — so the custom_vjp
saves only (q, k, v) which the training step already keeps live.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# VMEM ceilings (Np = padded sequence). Forward holds one [Np, Np] fp32
# score matrix (6.6 MB at Np=1280); backward holds three (scores, dP, dS).
_MAX_N_FWD = 2048
_MAX_N_BWD = 1024


def kernel_supports(n: int, head_dim: int, *, backward: bool) -> bool:
    """True iff the fused kernel handles this geometry.

    ``n`` is the unpadded sequence length (padded internally to a lane
    multiple); ``head_dim`` must be a single MXU tile wide.
    """
    n_pad = _round_up(n, _LANE)
    return head_dim <= _LANE and n_pad <= (_MAX_N_BWD if backward else _MAX_N_FWD)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _precision_for(dtype) -> jax.lax.Precision:
    # fp32 inputs (parity tests / eval in fp32) must not be silently
    # single-pass-bf16'd by the MXU; bf16 inputs take the fast path.
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _scores(q, k, scale: float, n_valid: int, precision):
    """[N, N] fp32 scaled, padding-masked score matrix."""
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    s = s * jnp.float32(scale)
    n = q.shape[0]
    if n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        s = jnp.where(col < n_valid, s, _MASK_VALUE)
    return s


def _softmax_stats(s, plus1: bool):
    """Row max ``m`` and denominator ``l`` (both [N, 1] fp32) and the
    unnormalized ``p = exp(s - m)``."""
    m = jnp.max(s, axis=-1, keepdims=True)
    if plus1:
        m = jnp.maximum(m, 0.0)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if plus1:
        l = l + jnp.exp(-m)
    return m, l, p


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, plus1, precision):
    q = q_ref[0, 0]  # [N, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = _scores(q, k, scale, n_valid, precision)
    _, l, p = _softmax_stats(s, plus1)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    # Normalize after PV on [N, D] (cheaper than normalizing p on [N, N],
    # and the division happens on the fp32 accumulator).
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, n_valid, plus1, precision
):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = _scores(q, k, scale, n_valid, precision)
    _, l, p = _softmax_stats(s, plus1)
    inv_l = 1.0 / l  # [N, 1]

    dot = functools.partial(
        jax.lax.dot_general, precision=precision, preferred_element_type=jnp.float32
    )
    contract = lambda a, b, dims: dot(a, b, dimension_numbers=(dims, ((), ())))

    # dV = P_norm^T @ dO, folding the row normalization into dO (the 1/l_i
    # rides the contraction index, so scale dO rows instead of all of P).
    do_n = (do.astype(jnp.float32) * inv_l).astype(p.dtype)
    dv = contract(p, do_n, ((0,), (0,)))  # [D_out rows: N, D] -> [N? ]
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # dP = dO @ V^T ; dS = P_norm * (dP - di) with di = rowsum(P_norm * dP).
    dp = contract(do, v, ((1,), (1,)))  # [N, N] fp32
    di = jnp.sum(p * dp, axis=-1, keepdims=True) * inv_l  # rowsum(pn * dp)
    ds = (p * inv_l) * (dp - di) * jnp.float32(scale)  # [N, N] fp32
    ds_c = ds.astype(q.dtype)

    dq_ref[0, 0] = contract(ds_c, k, ((1,), (0,))).astype(dq_ref.dtype)
    dk_ref[0, 0] = contract(ds_c, q, ((0,), (0,))).astype(dk_ref.dtype)


def _block_specs(b, h, n, d, count):
    spec = pl.BlockSpec((1, 1, n, d), lambda i, j: (i, j, 0, 0))
    return [spec] * count


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_attn(q, k, v, scale, n_valid, plus1, interpret):
    return _fused_attn_fwd(q, k, v, scale, n_valid, plus1, interpret)[0]


def _pallas_common(q, n_flops_factor, transcend_factor):
    b, h, n, d = q.shape
    cost = pl.CostEstimate(
        flops=n_flops_factor * b * h * n * n * d,
        bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
        transcendentals=transcend_factor * b * h * n * n,
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
    )
    return (b, h, n, d), cost, params


def _fused_attn_fwd(q, k, v, scale, n_valid, plus1, interpret):
    (b, h, n, d), cost, params = _pallas_common(q, 4, 1)
    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        n_valid=n_valid,
        plus1=plus1,
        precision=_precision_for(q.dtype),
    )
    o = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_block_specs(b, h, n, d, 3),
        out_specs=_block_specs(b, h, n, d, 1)[0],
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v)
    return o, (q, k, v)


def _fused_attn_bwd(scale, n_valid, plus1, interpret, res, do):
    q, k, v = res
    (b, h, n, d), cost, params = _pallas_common(q, 8, 1)
    kernel = functools.partial(
        _bwd_kernel,
        scale=scale,
        n_valid=n_valid,
        plus1=plus1,
        precision=_precision_for(q.dtype),
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_block_specs(b, h, n, d, 4),
        out_specs=tuple(_block_specs(b, h, n, d, 3)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
        ),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


_fused_attn.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    plus1: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused softmax(QK^T * scale) @ V.

    Args:
      q, k, v: ``[B, N, H, Dh]`` (the module layout produced by the fused
        qkv projection). Any float dtype; scores/softmax run in fp32.
      scale: score scale (``head_dim ** -0.5``).
      plus1: the reference "+1 trick" — softmax over ``[logits, 0]`` with
        the zero column dropped afterwards.
      interpret: force Pallas interpreter mode (defaults to True off-TPU so
        CPU tests exercise the same kernel).

    Returns:
      ``[B, N, H, Dh]`` attention output in the input dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, h, d = q.shape
    n_pad = _round_up(n, _LANE)
    # [B, N, H, D] -> [B, H, N, D]; XLA folds the transpose into the
    # surrounding reshape/projection copies.
    def to_bhnd(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        return x

    o = _fused_attn(
        to_bhnd(q), to_bhnd(k), to_bhnd(v), float(scale), n, bool(plus1), interpret
    )
    o = o[:, :, :n, :]
    return jnp.transpose(o, (0, 2, 1, 3))
