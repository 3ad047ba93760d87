"""Measure the IN-GRAPH marginal cost of LayerNorm feeding the qkv matmul
(the ceiling a fused LN->matmul Pallas kernel could reclaim; VERDICT
round-1 asked for this epilogue to be measured, not estimated).

Times, at exact flagship block shapes (B=12, N=474, D=768 -> 3D qkv):
  a) fwd:  sum(LN_fp32(x_bf16) @ W)      — the real pair
  b) fwd:  sum(x_hat_bf16 @ W)           — matmul alone
  c) grad: same pair, d/d(x, scale, W)
  d) grad: matmul alone, d/d(x_hat, W)
Delta (a-b) and (c-d) = LN's true in-graph marginal cost. If it is much
smaller than the standalone LN time (0.046/0.050 ms), XLA is already
fusing/hiding it and a custom fused kernel has no headroom.
Usage: python -u scripts/ln_fusion_probe.py
"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import timed

B, N, D = 12, 474, 768


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    xh = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)

    def ln(x, scale, bias):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias).astype(
            jnp.bfloat16
        )

    def pair(x, scale, bias, w):
        return jnp.sum((ln(x, scale, bias) @ w).astype(jnp.float32))

    def alone(xh, w):
        return jnp.sum((xh @ w).astype(jnp.float32))

    gsum = lambda t: jax.tree_util.tree_reduce(
        lambda s, y: s + jnp.sum(y).astype(jnp.float32), t, jnp.float32(0))

    entries = [
        ("LN->qkv fwd", pair, (x, scale, bias, w)),
        ("qkv fwd alone", alone, (xh, w)),
        ("LN->qkv grad", lambda *a: gsum(jax.grad(pair, argnums=(0, 1, 3))(*a)), (x, scale, bias, w)),
        ("qkv grad alone", lambda *a: gsum(jax.grad(alone, argnums=(0, 1))(*a)), (xh, w)),
    ]
    res = {}
    for name, fn, args in entries:
        ms = timed(fn, *args, steps=60, reps=5) * 1e3
        res[name] = ms
        print(f"[lnprobe] {name}: {ms:.4f} ms", flush=True)
    print(f"[lnprobe] fwd marginal: {res['LN->qkv fwd']-res['qkv fwd alone']:.4f} ms/site", flush=True)
    print(f"[lnprobe] grad marginal: {res['LN->qkv grad']-res['qkv grad alone']:.4f} ms/site", flush=True)


if __name__ == "__main__":
    main()
