"""Prototype: qkv-boundary fused attention (round-3 VERDICT #1a).

The shipped kernel (ops/pallas/attention.py) takes q/k/v in [B, H, N, D]
layout, which costs per block: 3 slice-copies of the fused qkv tensor +
3 input transposes + 1 output transpose in the forward, and the mirrored
glue (incl. the slice backward's pad/concat) in the backward — PARITY.md
bounds this at ~1 ms/step at B=12 x 12 blocks.

This prototype moves the kernel boundary to the RAW qkv Dense output:
  in:  qkv [B, N, 3*H*D]  (the Dense output itself — no reshape, no
       transpose, no slicing in the XLA graph at all)
  out: o   [B, N, H*D]    (feeds the proj Dense directly)
  bwd: dqkv [B, N, 3*H*D] (feeds the Dense backward directly)

Grid is (B,); the head loop is UNROLLED inside the kernel with static
64-wide lane slices (q_h at lanes [h*64,(h+1)*64), k at 768+h*64, v at
1536+h*64). Mosaic's block rule (last two dims divisible by (8,128) or
full) forbids blocking the head dim directly — lane slicing at static
offsets inside a full-row block is the layout-legal formulation. A
sublane-sliced variant ([B,N,3,H,D] blocks) was rejected by the lowering
rule before reaching the compiler; the round-2 head-loop-over-sublanes
variant crashed Mosaic.

Variants measured here (all against the XLA composition oracle):
  xla : einsum composition from the [B,N,3,H,D] reshape (the module fallback)
  cur : shipped path (slice + transpose + [B,H,N,D] kernel + transpose)
  qkv : new flat boundary
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from passt_tpu.ops.pallas.attention import fused_attention

B, H, N, D = 12, 12, 474, 64
C = H * D
SCALE = D ** -0.5
STEPS = 200


# ---------------------------------------------------------------- kernels
def _softmax_parts(q, k, scale, precision):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p, l


def _fwd_kernel_flat(qkv_ref, o_ref, *, heads, head_dim, scale, precision):
    c = heads * head_dim
    for h in range(heads):
        lo = h * head_dim
        q = qkv_ref[0, :, lo : lo + head_dim]
        k = qkv_ref[0, :, c + lo : c + lo + head_dim]
        v = qkv_ref[0, :, 2 * c + lo : 2 * c + lo + head_dim]
        p, l = _softmax_parts(q, k, scale, precision)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + head_dim] = (o / l).astype(o_ref.dtype)


def _bwd_kernel_flat(qkv_ref, do_ref, dqkv_ref, *, heads, head_dim, scale, precision):
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
        p, l = _softmax_parts(q, k, scale, precision)
        inv_l = 1.0 / l
        do_n = (do.astype(jnp.float32) * inv_l).astype(p.dtype)
        dv = contract(p, do_n, ((0,), (0,)))
        dp = contract(do, v, ((1,), (1,)))
        di = jnp.sum(p * dp, axis=-1, keepdims=True) * inv_l
        ds = (p * inv_l) * (dp - di) * jnp.float32(scale)
        ds_c = ds.astype(q.dtype)
        dqkv_ref[0, :, lo : lo + head_dim] = contract(ds_c, k, ((1,), (0,))).astype(
            dqkv_ref.dtype
        )
        dqkv_ref[0, :, c + lo : c + lo + head_dim] = contract(
            ds_c, q, ((0,), (0,))
        ).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + lo : 2 * c + lo + head_dim] = dv.astype(dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def attn_qkv(qkv, heads, head_dim, scale, interpret):
    return _attn_qkv_fwd(qkv, heads, head_dim, scale, interpret)[0]


def _prec(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _attn_qkv_fwd(qkv, heads, head_dim, scale, interpret):
    b, n, c3 = qkv.shape
    c = heads * head_dim
    cost = pl.CostEstimate(
        flops=4 * b * heads * n * n * head_dim,
        bytes_accessed=4 * b * n * c * qkv.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )
    params = pltpu.CompilerParams(dimension_semantics=("parallel",))
    kernel = functools.partial(
        _fwd_kernel_flat, heads=heads, head_dim=head_dim, scale=scale,
        precision=_prec(qkv.dtype),
    )
    o = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(qkv)
    return o, (qkv,)


def _attn_qkv_bwd(heads, head_dim, scale, interpret, res, do):
    (qkv,) = res
    b, n, c3 = qkv.shape
    c = heads * head_dim
    cost = pl.CostEstimate(
        flops=8 * b * heads * n * n * head_dim,
        bytes_accessed=8 * b * n * c * qkv.dtype.itemsize,
        transcendentals=b * heads * n * n,
    )
    params = pltpu.CompilerParams(dimension_semantics=("parallel",))
    kernel = functools.partial(
        _bwd_kernel_flat, heads=heads, head_dim=head_dim, scale=scale,
        precision=_prec(qkv.dtype),
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
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(qkv, do)
    return (dqkv,)


attn_qkv.defvjp(_attn_qkv_fwd, _attn_qkv_bwd)


# ---------------------------------------------------------------- harness
def timed(fn, *args, steps=STEPS, reps=3):
    def run_n(n, *a):
        def body(_, acc):
            eps = acc * jnp.float32(1e-20)
            first = a[0] + eps.astype(a[0].dtype)
            r = fn(first, *a[1:])
            return acc + jax.tree_util.tree_reduce(
                lambda s, x: s + x.sum().astype(jnp.float32), r, jnp.float32(0)
            )
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run_n)
    float(g(jnp.int32(steps), *args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(jnp.int32(steps), *args))
        t1 = time.perf_counter()
        float(g(jnp.int32(3 * steps), *args))
        t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (2 * steps)
        if dt > 0:
            best = min(best, dt)
    return best


def xla_ref(qkv_flat, scale):
    qkv = qkv_flat.reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, C)


def cur_path(qkv_flat, scale):
    qkv = qkv_flat.reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    return fused_attention(q, k, v, scale=scale).reshape(B, N, C)


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "interpret:", interpret, flush=True)
    rng = np.random.default_rng(0)
    for dtype in (jnp.bfloat16,):
        qkv = jnp.asarray(
            rng.standard_normal((B, N, 3 * C)).astype(np.float32)
        ).astype(dtype)

        new = lambda x, s: attn_qkv(x, H, D, s, interpret)

        # correctness
        o_ref = xla_ref(qkv, SCALE)
        o_new = new(qkv, SCALE)
        err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32) - o_new.astype(jnp.float32))))
        print(f"fwd max err vs xla: {err:.3e}", flush=True)

        gx = jax.grad(lambda x: (xla_ref(x, SCALE).astype(jnp.float32) ** 2).sum())(qkv).astype(jnp.float32)
        gn = jax.grad(lambda x: (new(x, SCALE).astype(jnp.float32) ** 2).sum())(qkv).astype(jnp.float32)
        rel = float(jnp.max(jnp.abs(gx - gn)) / (jnp.max(jnp.abs(gx)) + 1e-9))
        print(f"bwd max rel err vs xla AD: {rel:.3e}", flush=True)

        for name, fn in (("xla ", xla_ref), ("cur ", cur_path), ("qkv ", new)):
            dt = timed(lambda x: fn(x, SCALE), qkv)
            print(f"fwd  {name}: {dt*1e3:.4f} ms", flush=True)

        for name, fn in (("xla ", xla_ref), ("cur ", cur_path), ("qkv ", new)):
            g = jax.grad(lambda x: (fn(x, SCALE).astype(jnp.float32) ** 2).sum())
            dt = timed(g, qkv)
            print(f"f+b  {name}: {dt*1e3:.4f} ms", flush=True)


if __name__ == "__main__":
    main()
