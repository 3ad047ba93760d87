"""Fused Pallas TPU attention for PaSST's short-sequence regime.

The reference computes attention as materialized ``softmax(QK^T) @ V``
(reference: models/passt.py:331-361). At PaSST's sequence lengths
(N = 474 train / 1190 eval — *not* the 8k+ regime flash attention targets)
the [N, N] score matrix fits comfortably in VMEM, so the right TPU kernel
is the opposite of flash attention: **no KV tiling, no online softmax, no
residuals**. One grid program per (batch, head) — operands arrive
as [B, H, N, D] (one cheap XLA transpose from the module layout; an
in-kernel head loop over [B, N, H, D] blocks was tried and crashes the
Mosaic compiler: slicing a head is a per-head sublane relayout) —

  - computes the full [N, N] fp32 score matrix in VMEM (no padding:
    block dims equal to the array dims are exempt from tile-divisibility,
    Mosaic masks the unaligned N natively),
  - takes a plain (single-pass max/exp/sum) softmax,
  - multiplies into V — never spilling scores to HBM;

the backward kernel **recomputes** the scores from Q/K instead of
round-tripping the softmax output through HBM.

Measured on the real chip (B=12, H=12, D=64, scripts/ab_attention_micro.py):
standalone fwd 0.142 vs 0.127 ms XLA, but fwd+grad **0.246 vs 0.416 ms
per block (1.7x)** — the recompute-in-backward beats XLA's saved-softmax
backward. In the FULL train graph the step is 32.91 vs 32.99 ms (XLA
fuses its attention backward into the adjacent qkv/proj gradient matmuls,
absorbing most of the standalone win); at eval length N=1190 the
[B*H, N, N] materialization hurts XLA and the fused kernel wins 11%
end-to-end (3.45 vs 3.82 ms per B=12 step). The generic flash kernel was
measured ~9x slower than XLA at this N (PARITY.md "Measured dead ends"):
its small-block online-softmax machinery solves a problem PaSST does not
have. Two structural variants are measured dead ends: padded blocks with
explicit transposes (+2.4 ms full step) and a one-program-per-batch
head-loop layout (crashes the Mosaic compiler on the per-head sublane
relayout).

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

# VMEM ceilings (the kernel holds [N, N] fp32 intermediates: one in the
# forward, three in the backward).
_MAX_N_FWD = 2048
_MAX_N_BWD = 1024

# VMEM budgets for the flat-boundary kernel's analytic estimate, anchored
# to the MEASURED in-graph compile frontier on the v5e chip (C=768, H=12,
# D=64, B=12; qkv-dense -> kernel -> proj-dense context):
#   bf16 fwd:  N=600 compiles (est 10.3 MB), N=700 OOMs (est 12.5 MB)
#   bf16 bwd:  N=474 compiles and RUNS the full train step (est 12.9 MB)
#   fp32 fwd:  N=474 compiles (est 13.4 MB), N=520 OOMs (est 14.9 MB)
#   fp32 bwd:  est 23 MB at N=474 -> always the [B, H, N, D] kernel
# Mosaic's allocator is not an exact function of the estimate (its
# temporary reuse differs by direction/dtype), so each (direction,
# itemsize) carries its own measured budget rather than one constant.
_FLAT_VMEM_BUDGET = {
    (False, 2): int(10.5 * 1024 * 1024),  # bf16 fwd (ok @ est 10.3M)
    (True, 2): 14 * 1024 * 1024,  # bf16 bwd (ok @ est 12.9M)
    (False, 4): 14 * 1024 * 1024,  # fp32 fwd (ok 13.4M / OOM 14.9M)
    (True, 4): 14 * 1024 * 1024,  # fp32 bwd (never reached: est > budget)
}


def kernel_supports(n: int, head_dim: int, *, backward: bool) -> bool:
    """True iff the fused kernel handles this geometry (``n`` sequence
    length, ``head_dim`` at most one MXU tile wide)."""
    return head_dim <= 128 and n <= (_MAX_N_BWD if backward else _MAX_N_FWD)


# In a forward-only (eval) graph XLA may pin the flat kernel's WHOLE output
# in scoped VMEM ("allocating on stack", 16 MiB limit) to feed the fused
# proj-Dense without an HBM round trip — a placement it never makes in the
# train graph (the 25 MB dqkv at B=12/N=474 trains fine). Measured frontier:
# B=12, N=474 eval/train ok (8.9 MiB padded out); B=20, N=590 eval OOMs
# (19.5 MiB vs the 16 MiB scoped limit). Gate the forward selection on the
# padded output residence with margin.
_FLAT_FWD_OUT_BUDGET = 14 * 1024 * 1024


def flat_kernel_supports(
    n: int,
    heads: int,
    head_dim: int,
    *,
    backward: bool,
    itemsize: int = 2,
    batch: "Optional[int]" = None,
) -> bool:
    """True iff the flat qkv-boundary kernel (:func:`fused_attention_qkv`)
    fits this geometry in VMEM.

    The flat kernel holds full-row blocks — qkv [N, 3C] in, o/do [N, C],
    dqkv [N, 3C] out — double-buffered by the Pallas pipeline, plus the
    per-head fp32 [N, N] score intermediates (one live in the forward,
    ~three in the backward). Lane slicing needs ``head_dim`` to be a
    multiple of 8 (sublane grain) and at most one lane tile. With ``batch``
    given, forward selection additionally requires the full [B, N, C]
    output to fit the scoped-VMEM placement XLA makes in eval graphs (see
    ``_FLAT_FWD_OUT_BUDGET``)."""
    if head_dim > 128 or head_dim % 8 != 0:
        return False
    budget = _FLAT_VMEM_BUDGET.get((backward, itemsize))
    if budget is None:  # exotic dtype width: stay on the proven kernels
        return False
    c = heads * head_dim
    if not backward and batch is not None:
        try:
            b = int(batch)
        except TypeError:
            b = None  # symbolic batch dim (jax.export): keep prior behavior
        if b is not None:
            n_pad = -(-n // 8) * 8  # sublane padding of the [B, N, C] tile
            if b * n_pad * c * itemsize > _FLAT_FWD_OUT_BUDGET:
                return False
    if backward:
        blocks = 2 * n * (3 * c + c + 3 * c) * itemsize
        scores = 3 * n * n * 4
    else:
        blocks = 2 * n * (3 * c + c) * itemsize
        scores = 2 * n * n * 4
    return blocks + scores <= budget


def _precision_for(dtype) -> jax.lax.Precision:
    # fp32 inputs (parity tests / eval in fp32) must not be silently
    # single-pass-bf16'd by the MXU; bf16 inputs take the fast path.
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _softmax_parts(q, k, scale: float, plus1: bool, precision):
    """fp32 scores -> (unnormalized p, denominator l [N, 1])."""
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    if plus1:
        m = jnp.maximum(m, 0.0)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if plus1:
        l = l + jnp.exp(-m)
    return p, l


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, plus1, precision):
    q = q_ref[0, 0]  # [N, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    p, l = _softmax_parts(q, k, scale, plus1, precision)
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
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, plus1, precision
):
    contract = lambda a, b, dims: jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    p, l = _softmax_parts(q, k, scale, plus1, precision)
    inv_l = 1.0 / l  # [N, 1]

    # dV = P_norm^T @ dO, folding the row normalization into dO (the 1/l_i
    # rides the contraction index, so scale dO rows instead of all of P).
    do_n = (do.astype(jnp.float32) * inv_l).astype(p.dtype)
    dv_ref[0, 0] = contract(p, do_n, ((0,), (0,))).astype(dv_ref.dtype)

    # dP = dO @ V^T ; dS = P_norm * (dP - di), di = rowsum(P_norm * dP).
    dp = contract(do, v, ((1,), (1,)))  # [N, N] fp32
    di = jnp.sum(p * dp, axis=-1, keepdims=True) * inv_l
    ds = (p * inv_l) * (dp - di) * jnp.float32(scale)
    ds_c = ds.astype(q.dtype)

    dq_ref[0, 0] = contract(ds_c, k, ((1,), (0,))).astype(dq_ref.dtype)
    dk_ref[0, 0] = contract(ds_c, q, ((0,), (0,))).astype(dk_ref.dtype)


def _specs(n, d, count):
    # [B, H, N, D] blocks, one (batch, head) per program. The trailing
    # (N, D) block dims equal the array dims, so unaligned N needs no pad.
    spec = pl.BlockSpec((1, 1, n, d), lambda b, h: (b, h, 0, 0))
    return [spec] * count


def _common(q, flops_factor):
    b, h, n, d = q.shape
    cost = pl.CostEstimate(
        flops=flops_factor * b * h * n * n * d,
        bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
        transcendentals=b * h * n * n,
    )
    params = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"))
    return (b, h, n, d), cost, params


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_attn(q, k, v, scale, plus1, interpret):
    return _fused_attn_fwd(q, k, v, scale, plus1, interpret)[0]


def _fused_attn_fwd(q, k, v, scale, plus1, interpret):
    (b, h, n, d), cost, params = _common(q, 4)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, plus1=plus1, precision=_precision_for(q.dtype)
    )
    o = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_specs(n, d, 3),
        out_specs=_specs(n, d, 1)[0],
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v)
    return o, (q, k, v)


def _xla_attn_bwd(q, k, v, do, scale, plus1):
    """Plain-XLA attention backward in the [B, N, H, D] layout — THE one
    fallback implementation shared by both custom kernels' past-VMEM
    paths (round-5 review finding: two drifting ~20-line copies).
    HIGHEST precision: default lowers fp32 dots to single-pass bf16 on
    the MXU, which would break the fp32-score contract. Slower than the
    kernels, never wrong."""
    ein = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    qf, kf, vf, dof = (x.astype(jnp.float32) for x in (q, k, v, do))
    s = ein("bnhd,bmhd->bhnm", qf, kf) * jnp.float32(scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    if plus1:
        m = jnp.maximum(m, 0.0)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if plus1:
        l = l + jnp.exp(-m)
    pn = p / l
    dp = ein("bnhd,bmhd->bhnm", dof, vf)
    di = jnp.sum(pn * dp, axis=-1, keepdims=True)
    ds = pn * (dp - di) * jnp.float32(scale)
    dq = ein("bhnm,bmhd->bnhd", ds, kf).astype(q.dtype)
    dk = ein("bhnm,bnhd->bmhd", ds, qf).astype(k.dtype)
    dv = ein("bhnm,bnhd->bmhd", pn, dof).astype(v.dtype)
    return dq, dk, dv


def _fused_attn_bwd(scale, plus1, interpret, res, do):
    q, k, v = res
    (b, h, n, d), cost, params = _common(q, 8)
    if not kernel_supports(n, d, backward=True):
        # Geometry past the backward kernel's VMEM ceiling — reachable via
        # jax.grad through an eval-mode apply (the module gates kernel
        # selection on backward=train, so e.g. saliency maps at eval
        # N=1190 take the fused FORWARD). Operands here are [B, H, N, D];
        # the shared fallback speaks [B, N, H, D] — transpose around it
        # (this path is rare and already off the fast kernels).
        qt, kt, vt, dot = (
            jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v, do)
        )
        dq, dk, dv = _xla_attn_bwd(qt, kt, vt, dot, scale, plus1)
        return tuple(jnp.transpose(x, (0, 2, 1, 3)) for x in (dq, dk, dv))
    kernel = functools.partial(
        _bwd_kernel, scale=scale, plus1=plus1, precision=_precision_for(q.dtype)
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=_specs(n, d, 4),
        out_specs=tuple(_specs(n, d, 3)),
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
        qkv projection — consumed in place, no transposes). Any float
        dtype; scores/softmax run in fp32.
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
    # [B, N, H, D] -> [B, H, N, D]; the inverse on the way out. XLA
    # schedules these as cheap copies (~8.7 MB each at train geometry).
    q, k, v = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
    o = _fused_attn(q, k, v, float(scale), bool(plus1), interpret)
    return jnp.transpose(o, (0, 2, 1, 3))


# --------------------------------------------------------------------------
# Flat qkv-boundary kernel (round 3): the kernel boundary IS the fused qkv
# Dense output [B, N, 3C] and the proj Dense input [B, N, C] — no reshapes,
# slices, or transposes in the XLA graph at all, and the backward emits
# dqkv in the Dense-backward layout directly. Grid is (B,); the head loop
# is UNROLLED with static 64-grain LANE slices inside full-row blocks
# (Mosaic's block rule — last two block dims divisible by (8, 128) or full
# — forbids blocking the head dim of a [B, N, 3, H, D] view, and sublane
# head slicing crashed the Mosaic compiler in round 2; static lane slicing
# is the layout-legal formulation). Measured on the chip at flagship train
# geometry (B=12, H=12, N=474, D=64, bf16; scripts/proto_attn_qkv.py):
# standalone fwd 0.140 vs 0.217 ms and fwd+bwd 0.491 vs 0.611 ms per block
# against the transpose-boundary kernel above — the delta is exactly the
# boundary glue PARITY.md round 2 bounded at ~1 ms/step.
# --------------------------------------------------------------------------


def _flat_fwd_kernel(qkv_ref, o_ref, *, heads, head_dim, scale, plus1, precision):
    c = heads * head_dim
    for h in range(heads):
        lo = h * head_dim
        q = qkv_ref[0, :, lo : lo + head_dim]
        k = qkv_ref[0, :, c + lo : c + lo + head_dim]
        v = qkv_ref[0, :, 2 * c + lo : 2 * c + lo + head_dim]
        p, l = _softmax_parts(q, k, scale, plus1, precision)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + head_dim] = (o / l).astype(o_ref.dtype)


def _flat_bwd_kernel(
    qkv_ref, do_ref, dqkv_ref, *, heads, head_dim, scale, plus1, precision
):
    contract = lambda a, b, dims: jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    c = heads * head_dim
    for h in range(heads):
        lo = h * head_dim
        q = qkv_ref[0, :, lo : lo + head_dim]
        k = qkv_ref[0, :, c + lo : c + lo + head_dim]
        v = qkv_ref[0, :, 2 * c + lo : 2 * c + lo + head_dim]
        do = do_ref[0, :, lo : lo + head_dim]
        p, l = _softmax_parts(q, k, scale, plus1, precision)
        inv_l = 1.0 / l
        # Same math as _bwd_kernel (see module docstring): dV with the row
        # normalization folded into dO; dS = P_norm*(dP - di)*scale. The
        # plus1 column is constant => backward formula unchanged.
        do_n = (do.astype(jnp.float32) * inv_l).astype(p.dtype)
        dv = contract(p, do_n, ((0,), (0,)))
        dp = contract(do, v, ((1,), (1,)))
        di = jnp.sum(p * dp, axis=-1, keepdims=True) * inv_l
        ds = (p * inv_l) * (dp - di) * jnp.float32(scale)
        ds_c = ds.astype(q.dtype)
        dqkv_ref[0, :, lo : lo + head_dim] = contract(
            ds_c, k, ((1,), (0,))
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + lo : c + lo + head_dim] = contract(
            ds_c, q, ((0,), (0,))
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + lo : 2 * c + lo + head_dim] = dv.astype(
            dqkv_ref.dtype
        )


def _flat_cost(qkv, heads, head_dim, flops_factor):
    b, n, _ = qkv.shape
    c = heads * head_dim
    return pl.CostEstimate(
        flops=flops_factor * b * heads * n * n * head_dim,
        bytes_accessed=flops_factor // 2 * b * n * c * qkv.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _flat_attn(qkv, heads, head_dim, scale, plus1, interpret):
    return _flat_attn_fwd(qkv, heads, head_dim, scale, plus1, interpret)[0]


def _flat_attn_fwd(qkv, heads, head_dim, scale, plus1, interpret):
    b, n, c3 = qkv.shape
    c = heads * head_dim
    kernel = functools.partial(
        _flat_fwd_kernel, heads=heads, head_dim=head_dim, scale=scale,
        plus1=plus1, precision=_precision_for(qkv.dtype),
    )
    o = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=_flat_cost(qkv, heads, head_dim, 4),
        interpret=interpret,
    )(qkv)
    return o, (qkv,)


def _flat_attn_bwd(heads, head_dim, scale, plus1, interpret, res, do):
    (qkv,) = res
    b, n, c3 = qkv.shape
    c = heads * head_dim
    if not flat_kernel_supports(
        n, heads, head_dim, backward=True, itemsize=qkv.dtype.itemsize
    ):
        # Reachable only by differentiating through a forward that was
        # selected with backward=False gating (saliency through eval):
        # the shared _xla_attn_bwd fallback, with the flat<->[B,N,H,D]
        # reshape glue here.
        qkv5 = qkv.reshape(b, n, 3, heads, head_dim)
        dq, dk, dv = _xla_attn_bwd(
            qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2],
            do.reshape(b, n, heads, head_dim), scale, plus1,
        )
        dqkv = jnp.stack([dq, dk, dv], axis=2).reshape(b, n, c3)
        return (dqkv.astype(qkv.dtype),)
    kernel = functools.partial(
        _flat_bwd_kernel, heads=heads, head_dim=head_dim, scale=scale,
        plus1=plus1, precision=_precision_for(qkv.dtype),
    )
    dqkv = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c3), qkv.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=_flat_cost(qkv, heads, head_dim, 8),
        interpret=interpret,
    )(qkv, do)
    return (dqkv,)


_flat_attn.defvjp(_flat_attn_fwd, _flat_attn_bwd)


def fused_attention_qkv(
    qkv: jnp.ndarray,
    *,
    heads: int,
    head_dim: int,
    scale: float,
    plus1: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention over the RAW fused-qkv projection output.

    Args:
      qkv: ``[B, N, 3*heads*head_dim]`` — the qkv Dense output with the
        reference column order ``(qkv, head, dim)``; consumed in place.
      heads, head_dim: head geometry (``3*heads*head_dim == qkv.shape[-1]``).
      scale: score scale (``head_dim ** -0.5``).
      plus1: the reference "+1 trick" (see :func:`fused_attention`).
      interpret: force Pallas interpreter mode (defaults to True off-TPU).

    Returns:
      ``[B, N, heads*head_dim]`` in the input dtype — the proj Dense input.
      The VJP emits ``d(qkv)`` in the input layout (one kernel, no glue).
    """
    if qkv.shape[-1] != 3 * heads * head_dim:
        raise ValueError(
            f"qkv last dim {qkv.shape[-1]} != 3*{heads}*{head_dim}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flat_attn(qkv, heads, head_dim, float(scale), bool(plus1), interpret)
