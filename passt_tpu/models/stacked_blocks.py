"""Stacked-weights transformer stack with a deferred, BATCHED dW backward.

The third — and winning-by-construction — formulation of VERDICT r4 lever
1(a), built from two round-5 measurements (PARITY.md "Measured dead
ends"):

- plain ``nn.scan`` over stacked params is exact but 27.30 -> 33.38
  ms/step (it runs the same per-block dW GEMM 12x sequentially AND
  unfuses the optimizer epilogue) — scripts/ab_scan_blocks.py;
- the isolated hypothesis is real: batched [12, ...] dW GEMMs + ONE
  stacked bf16+SR optimizer fusion beat 12x(dW GEMM + fused epilogue)
  4.849 -> 3.892 ms/iter (199 -> 248 TFLOP/s) at the exact production
  shapes — scripts/ab_batched_dw.py.

Plain AD cannot express the winning schedule: reverse-mode emits each
block's dW GEMM inline in the sequential dx chain. This module therefore
hand-writes the stack backward as a ``custom_vjp``:

  forward:  UNROLLED python loop over ``params[l]`` slices of stacked
            [depth, ...] leaves — the XLA-friendly graph the loop
            implementation compiles (27.3 ms), not a lax.scan;
  backward: the sequential part computes ONLY the dx chain and the local
            GEMM-output cotangents (dqkv, dh, du, dv per block); the 4
            weight-gradient families then become 4 BATCHED dot_generals
            over the stacked saved activations, writing [depth, ...]
            grads that meet the optimizer as single stacked leaves (one
            update fusion per weight type instead of 48).

Scope (production train graph): dropout / droppath / attention-dropout
are 0 in every recipe's hot loop — this implementation requires that and
the model gates on it (PaSSTConfig.blocks_impl="stacked"). Block math and
dtype discipline mirror models/passt.py Block exactly (pre-norm, fp32
fast-variance LN, bf16 GEMMs, tanh-GELU with saved derivative, fp32
attention softmax via the flat Pallas kernel); gradients are oracle-tested
against AD of the module path (tests/test_stacked_blocks.py).

Reference semantics being reproduced: models/passt.py:364-380 (Block),
271-290 (Mlp), 331-361 (Attention).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from passt_tpu.ops.pallas.attention import (
    _flat_attn_bwd,
    _flat_attn_fwd,
    flat_kernel_supports,
    fused_attention,
    kernel_supports,
)
from passt_tpu.ops.pallas.ln_qkv import ln_stats

_C = math.sqrt(2.0 / math.pi)
_A = 0.044715


def _ln_fwd(x, scale, bias, eps=1e-6):
    """fp32 fast-variance LayerNorm (== nn.LayerNorm(dtype=f32) defaults;
    statistics via the shared ops.pallas.ln_qkv.ln_stats).
    Returns (xn_f32, mu, rstd)."""
    xf = x.astype(jnp.float32)
    mu, rstd = ln_stats(xf, eps)
    xn = (xf - mu) * rstd * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return xn, mu, rstd


def _ln_bwd(x, mu, rstd, scale, dxn):
    """One-block LN backward from the saved input + statistics.
    dxn fp32 [B, N, C] -> (dx fp32, dscale fp32 [C], dbias fp32 [C])."""
    xhat = (x.astype(jnp.float32) - mu) * rstd
    dscale = jnp.sum(dxn * xhat, axis=(0, 1))
    dbias = jnp.sum(dxn, axis=(0, 1))
    dxhat = dxn * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, dscale, dbias


def _gelu_fwd(u, approximate):
    """GELU value + saved derivative. ``approximate=True``: the tanh form
    (ops/activations.py tanh_gelu — the bf16 production path);
    False: the exact erf form (torch nn.GELU / fp32 parity path,
    derivative Phi(x) + x*phi(x))."""
    uf = u.astype(jnp.float32)
    if approximate:
        t = jnp.tanh(_C * (uf + _A * uf * uf * uf))
        g = (0.5 * uf * (1.0 + t)).astype(u.dtype)
        gp = (
            0.5 * (1.0 + t)
            + 0.5 * uf * (1.0 - t * t) * _C * (1.0 + 3.0 * _A * uf * uf)
        ).astype(u.dtype)
        return g, gp
    phi_c = jax.scipy.stats.norm.cdf(uf)
    pdf = jnp.exp(-0.5 * uf * uf) * jnp.float32(1.0 / math.sqrt(2.0 * math.pi))
    g = (uf * phi_c).astype(u.dtype)
    gp = (phi_c + uf * pdf).astype(u.dtype)
    return g, gp


def _dense(x, kernel, bias):
    """nn.Dense semantics at the block compute dtype: operands cast to
    x.dtype, dot at default precision, bias added in x.dtype."""
    y = jnp.dot(x, kernel.astype(x.dtype))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _attn_fwd(qkv, heads, head_dim, scale, plus1, interpret, backward):
    """Attention forward with the module path's exact 3-way kernel
    selection (flat -> [B,H,N,D] kernel -> einsum; models/passt.py
    Attention): ``backward`` is the train flag, so eval graphs get the
    forward-only gates — including the scoped-VMEM output guard the flat
    gate applies via ``batch`` — and eval lengths past the flat frontier
    still take the [B,H,N,D] kernel instead of the materialized einsum
    (round-5 review finding)."""
    b, n, _ = qkv.shape
    if flat_kernel_supports(
        n, heads, head_dim, backward=backward, itemsize=qkv.dtype.itemsize,
        batch=b,
    ):
        return _flat_attn_fwd(qkv, heads, head_dim, scale, plus1, interpret)[0]
    qkv5 = qkv.reshape(b, n, 3, heads, head_dim)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]  # [B, N, H, D]
    if kernel_supports(n, head_dim, backward=backward):
        o = fused_attention(q, k, v, scale=scale, plus1=plus1, interpret=interpret)
        return o.reshape(b, n, heads * head_dim)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * jnp.float32(scale)
    if plus1:
        s = jnp.concatenate([s, jnp.zeros(s.shape[:-1] + (1,), s.dtype)], -1)
    p = jax.nn.softmax(s, axis=-1)
    if plus1:
        p = p[..., :-1]
    o = jnp.einsum("bhnm,bmhd->bnhd", p.astype(qkv.dtype), v)
    return o.reshape(b, n, heads * head_dim)


def stacked_param_shapes(depth, c, mlp_hidden, qkv_bias=True):
    """The 'blocks/block' stacked subtree layout (== the nn.scan layout)."""
    del qkv_bias
    return {
        "norm1": {"scale": (depth, c), "bias": (depth, c)},
        "attn": {
            "qkv": {"kernel": (depth, c, 3 * c), "bias": (depth, 3 * c)},
            "proj": {"kernel": (depth, c, c), "bias": (depth, c)},
        },
        "norm2": {"scale": (depth, c), "bias": (depth, c)},
        "mlp": {
            "fc1": {"kernel": (depth, c, mlp_hidden), "bias": (depth, mlp_hidden)},
            "fc2": {"kernel": (depth, mlp_hidden, c), "bias": (depth, c)},
        },
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def stacked_blocks_apply(params, x, heads, plus1, att_scale, interpret, gelu_approximate=True, train=False):
    """Unrolled pre-norm block stack over stacked [depth, ...] params.

    ``params``: the stacked subtree (see :func:`stacked_param_shapes`).
    ``x``: [B, N, C] residual stream in the compute dtype.
    """
    return _stacked_fwd(params, x, heads, plus1, att_scale, interpret, gelu_approximate, train)[0]


def _block_fwd(p, x, heads, plus1, att_scale, interpret, gelu_approximate, train):
    """One block forward; returns (out, residuals-for-backward)."""
    c = x.shape[-1]
    head_dim = c // heads
    xn1_f, mu1, rstd1 = _ln_fwd(x, p["norm1"]["scale"], p["norm1"]["bias"])
    xn1 = xn1_f.astype(x.dtype)
    qkv = _dense(xn1, p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"])
    a = _attn_fwd(qkv, heads, head_dim, att_scale, plus1, interpret, train)
    h = _dense(a, p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"])
    x2 = x + h
    xn2_f, mu2, rstd2 = _ln_fwd(x2, p["norm2"]["scale"], p["norm2"]["bias"])
    xn2 = xn2_f.astype(x.dtype)
    u = _dense(xn2, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"])
    g, gp = _gelu_fwd(u, gelu_approximate)
    v = _dense(g, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"])
    out = x2 + v
    res = dict(
        x=x, mu1=mu1, rstd1=rstd1, xn1=xn1, qkv=qkv, a=a,
        x2=x2, mu2=mu2, rstd2=rstd2, xn2=xn2, g=g, gp=gp,
    )
    return out, res


def _stacked_fwd(params, x, heads, plus1, att_scale, interpret, gelu_approximate, train):
    depth = params["norm1"]["scale"].shape[0]
    saved = []
    for l in range(depth):
        p_l = jax.tree.map(lambda w: w[l], params)
        x, res = _block_fwd(p_l, x, heads, plus1, att_scale, interpret, gelu_approximate, train)
        saved.append(res)
    # Stack each residual family [depth, ...] — XLA lays the per-block
    # producers out to write their stack slices directly (concat fusion);
    # the stacked form is what the batched dW GEMMs consume.
    stacked_res = jax.tree.map(lambda *xs: jnp.stack(xs), *saved)
    return x, (params, stacked_res)


def _stacked_bwd(heads, plus1, att_scale, interpret, gelu_approximate, train, resids, dy):
    params, r = resids
    depth = params["norm1"]["scale"].shape[0]
    c = dy.shape[-1]
    head_dim = c // heads
    wq = params["attn"]["qkv"]["kernel"]
    wp = params["attn"]["proj"]["kernel"]
    w1 = params["mlp"]["fc1"]["kernel"]
    w2 = params["mlp"]["fc2"]["kernel"]

    dqkv_l, dh_l, du_l, dv_l = [], [], [], []
    ds1_l, db1_l, ds2_l, db2_l = [], [], [], []
    dx = dy
    for l in range(depth - 1, -1, -1):
        # MLP branch: out = x2 + fc2(gelu(fc1(LN2(x2))))
        dv = dx  # cotangent at the fc2 output (bf16)
        dg = jnp.dot(dv, w2[l].astype(dv.dtype).T)
        du = (dg.astype(jnp.float32) * r["gp"][l].astype(jnp.float32)).astype(
            dv.dtype
        )
        dxn2 = jnp.dot(du, w1[l].astype(du.dtype).T)
        dx2_ln, ds2, db2 = _ln_bwd(
            r["x2"][l], r["mu2"][l], r["rstd2"][l],
            params["norm2"]["scale"][l], dxn2.astype(jnp.float32),
        )
        dx2 = dx + dx2_ln.astype(dx.dtype)

        # attention branch: x2 = x + proj(attn(qkv(LN1(x))))
        dh = dx2  # cotangent at the proj output
        da = jnp.dot(dh, wp[l].astype(dh.dtype).T)
        (dqkv,) = _flat_attn_bwd(
            heads, head_dim, att_scale, plus1, interpret, (r["qkv"][l],), da
        )
        dxn1 = jnp.dot(dqkv, wq[l].astype(dqkv.dtype).T)
        dx_ln, ds1, db1 = _ln_bwd(
            r["x"][l], r["mu1"][l], r["rstd1"][l],
            params["norm1"]["scale"][l], dxn1.astype(jnp.float32),
        )
        dx = dx2 + dx_ln.astype(dx.dtype)

        dqkv_l.append(dqkv); dh_l.append(dh); du_l.append(du); dv_l.append(dv)
        ds1_l.append(ds1); db1_l.append(db1); ds2_l.append(ds2); db2_l.append(db2)

    def stack_rev(xs):
        return jnp.stack(xs[::-1])

    dqkv_s, dh_s, du_s, dv_s = map(stack_rev, (dqkv_l, dh_l, du_l, dv_l))

    # THE deferred, batched weight gradients: one [depth, in, out]
    # dot_general per weight family (scripts/ab_batched_dw.py: 248 vs 199
    # TFLOP/s against per-block GEMMs with fused epilogues).
    def bdw(acts, cots):
        return jax.lax.dot_general(
            acts, cots,
            dimension_numbers=((((1, 2), (1, 2))), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def cast_like(g, w):
        return g.astype(w.dtype)

    grads = {
        "norm1": {
            "scale": cast_like(stack_rev(ds1_l), params["norm1"]["scale"]),
            "bias": cast_like(stack_rev(db1_l), params["norm1"]["bias"]),
        },
        "attn": {
            "qkv": {
                "kernel": cast_like(bdw(r["xn1"], dqkv_s), wq),
                "bias": cast_like(
                    jnp.sum(dqkv_s.astype(jnp.float32), axis=(1, 2)),
                    params["attn"]["qkv"]["bias"],
                ),
            },
            "proj": {
                "kernel": cast_like(bdw(r["a"], dh_s), wp),
                "bias": cast_like(
                    jnp.sum(dh_s.astype(jnp.float32), axis=(1, 2)),
                    params["attn"]["proj"]["bias"],
                ),
            },
        },
        "norm2": {
            "scale": cast_like(stack_rev(ds2_l), params["norm2"]["scale"]),
            "bias": cast_like(stack_rev(db2_l), params["norm2"]["bias"]),
        },
        "mlp": {
            "fc1": {
                "kernel": cast_like(bdw(r["xn2"], du_s), w1),
                "bias": cast_like(
                    jnp.sum(du_s.astype(jnp.float32), axis=(1, 2)),
                    params["mlp"]["fc1"]["bias"],
                ),
            },
            "fc2": {
                "kernel": cast_like(bdw(r["g"], dv_s), w2),
                "bias": cast_like(
                    jnp.sum(dv_s.astype(jnp.float32), axis=(1, 2)),
                    params["mlp"]["fc2"]["bias"],
                ),
            },
        },
    }
    return grads, dx


stacked_blocks_apply.defvjp(_stacked_fwd, _stacked_bwd)
