"""Bound the remaining non-matmul glue, component by component, at the
flagship train shapes (B=12, N=474, D=768, bf16 compute, fp32 residual):

  - MLP stack (Dense 768->3072 + tanh GELU + Dense 3072->768), fwd / grad
  - the same MLP with GELU removed (pure matmuls) — the difference IS the
    measured GELU cost in context
  - fp32 LayerNorm alone, fwd / grad
  - attention (XLA vs fused kernel) — cross-check of ab_attention_micro
  - the matmul-only floor for the MLP shapes

Each entry is a differenced in-jit measurement (profile_step.timed), so
the resulting PARITY.md table rows are measured bounds, not estimates.
Usage: python -u scripts/profile_glue.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import timed

B, N, D, F = 12, 474, 768, 3072
M = B * N


def report(name, ms, mult=12):
    print(f"{name}: {ms:.3f} ms  (x{mult} blocks = {ms*mult:.2f} ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.02, jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    gamma = jnp.ones((D,), jnp.float32)
    beta = jnp.zeros((D,), jnp.float32)

    def ln(x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta

    def mlp(x, use_gelu=True):
        h = x.astype(jnp.bfloat16) @ w1
        if use_gelu:
            h = nn.gelu(h, approximate=True)
        return (h @ w2).astype(jnp.float32)

    loss = lambda fn: (lambda x: jnp.sum(fn(x) * g))

    entries = [
        ("mlp fwd (matmul+gelu)", lambda x: jnp.sum(mlp(x) * g)),
        ("mlp fwd (matmul only)", lambda x: jnp.sum(mlp(x, False) * g)),
        ("mlp grad (matmul+gelu)", jax.grad(loss(mlp))),
        ("mlp grad (matmul only)", jax.grad(loss(lambda x: mlp(x, False)))),
        ("ln fwd", lambda x: jnp.sum(ln(x) * g)),
        ("ln grad", jax.grad(loss(ln))),
    ]
    for name, fn in entries:
        wrapped = (lambda f: (lambda x: jax.tree_util.tree_reduce(
            lambda s, y: s + jnp.sum(y).astype(jnp.float32), f(x), jnp.float32(0)
        )))(fn)
        ms = timed(wrapped, x32, steps=30) * 1e3
        mult = 25 if name.startswith("ln") else 12
        report(name, ms, mult)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} M={M}", flush=True)
    main()
