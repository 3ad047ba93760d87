"""One consolidated chip-measurement pass (axon compile queue is slow, so
every remaining number rides one process):

  1. profile_glue components: MLP fwd/grad with and without GELU, LN
     fwd/grad — measured bounds for the PARITY kernel table.
  2. Optimizer update micro at PaSST-S scale (86M params in 4 leaves):
     optax.adamw fp32 vs adamw_bf16sr (hardware-RNG SR) vs sr_nu=False —
     the bandwidth-vs-overhead account for the bf16 moments knob.

Usage: python -u scripts/profile_round2.py
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import timed

B, N, D, F = 12, 474, 768, 3072


def glue():
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

    def mlp_of(use_gelu):
        def f(x, w1, w2):
            h = x.astype(jnp.bfloat16) @ w1
            if use_gelu:
                h = nn.gelu(h, approximate=True)
            return (h @ w2).astype(jnp.float32)
        return f

    # grads wrt x AND the weights — the real training contraction set
    loss3 = lambda fn: (lambda x, w1, w2: jnp.sum(fn(x, w1, w2) * g))
    loss1 = lambda fn: (lambda x: jnp.sum(fn(x) * g))
    entries = [
        ("mlp fwd gelu", mlp_of(True), (x32, w1, w2), 12),
        ("mlp grad gelu", jax.grad(loss3(mlp_of(True)), argnums=(0, 1, 2)), (x32, w1, w2), 12),
        ("mlp grad plain", jax.grad(loss3(mlp_of(False)), argnums=(0, 1, 2)), (x32, w1, w2), 12),
        ("ln fwd", ln, (x32,), 25),
        ("ln grad", jax.grad(loss1(ln)), (x32,), 25),
    ]
    for name, fn, args, mult in entries:
        wrapped = (lambda f: (lambda *a: jax.tree_util.tree_reduce(
            lambda s, y: s + jnp.sum(y).astype(jnp.float32), f(*a), jnp.float32(0)
        )))(fn)
        try:
            ms = timed(wrapped, *args, steps=40, reps=5) * 1e3
        except RuntimeError as e:
            print(f"[glue] {name}: SKIPPED ({e})", flush=True)
            continue
        print(f"[glue] {name}: {ms:.3f} ms (x{mult} = {ms*mult:.2f} ms)", flush=True)


def opt_micro():
    from passt_tpu.train.optim import adamw_bf16sr

    rng = np.random.default_rng(1)
    params = {
        "a": jnp.asarray(rng.standard_normal((5688, 3072)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((3072, 5688)), jnp.float32),
        "c": jnp.asarray(rng.standard_normal((6144, 4096)), jnp.float32),
        "d": jnp.asarray(rng.standard_normal((4096, 6144)), jnp.float32),
    }  # ~85M params
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"[opt] {n_params/1e6:.1f}M params", flush=True)
    variants = [
        ("optax fp32", optax.adamw(1e-3, weight_decay=1e-4)),
        ("bf16 + SR(rbg)", adamw_bf16sr(1e-3, weight_decay=1e-4)),
        ("bf16 no-SR", adamw_bf16sr(1e-3, weight_decay=1e-4, sr_nu=False)),
    ]
    for name, tx in variants:
        state = tx.init(params)

        def one(params, state):
            g = jax.tree_util.tree_map(lambda p: p * 1e-4, params)
            u, s2 = tx.update(g, state, params)
            return optax.apply_updates(params, u), s2

        def run(params, state, n):
            def body(_, carry):
                return one(*carry)
            return jax.lax.fori_loop(0, n, body, (params, state))

        fn = jax.jit(run, static_argnums=(2,), donate_argnums=(0, 1))
        import time as _t
        p, s = jax.tree_util.tree_map(lambda x: x.copy(), (params, state))
        p, s = fn(p, s, 10)
        jax.block_until_ready(jax.tree_util.tree_leaves(p)[0][0, 0].copy())
        best = float("inf")
        for _ in range(3):
            t0 = _t.perf_counter()
            p, s = fn(p, s, 10)
            float(jax.tree_util.tree_leaves(p)[0][0, 0])
            t1 = _t.perf_counter()
            p, s = fn(p, s, 30)
            float(jax.tree_util.tree_leaves(p)[0][0, 0])
            t2 = _t.perf_counter()
            dt = ((t2 - t1) - (t1 - t0)) / 20
            if dt > 0:
                best = min(best, dt)
        print(f"[opt] {name}: {best*1e3:.3f} ms / update", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    glue()
    opt_micro()
