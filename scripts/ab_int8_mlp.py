"""A/B: bf16 XLA MLP vs int8 Pallas quantized MLP (fwd and fwd+bwd).

Shapes: the PaSST-S MLP at train (M=5688) and eval (M=14280) token counts.
Prints timings + quantization error so PARITY.md can carry a measured row.
Run on the real chip: python scripts/ab_int8_mlp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scripts.profile_step import timed
from passt_tpu.ops.activations import tanh_gelu
from passt_tpu.ops.pallas.int8_dense import int8_dense, int8_dense_gelu

C, H = 768, 3072


def make_args(m, rng):
    x = jnp.asarray(rng.standard_normal((m, C)).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal((C, H)) * 0.02).astype(np.float32), jnp.bfloat16)
    b1 = jnp.zeros((H,), jnp.float32)
    w2 = jnp.asarray((rng.standard_normal((H, C)) * 0.02).astype(np.float32), jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.float32)
    return x, w1, b1, w2, b2


def mlp_bf16(x, w1, b1, w2, b2):
    h = tanh_gelu(jnp.dot(x, w1) + b1.astype(x.dtype))
    return jnp.dot(h, w2) + b2.astype(x.dtype)


def mlp_int8(x, w1, b1, w2, b2):
    h = int8_dense_gelu(x, w1, b1)
    return int8_dense(h, w2, b2)


def loss(fn):
    def f(x, *args):
        return (fn(x, *args).astype(jnp.float32) ** 2).mean()

    return f


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for m in (5688, 14280):
        args = make_args(m, rng)
        # correctness: quantization error of the full chain
        yb = np.asarray(jax.jit(mlp_bf16)(*args), np.float32)
        yi = np.asarray(jax.jit(mlp_int8)(*args), np.float32)
        denom = np.abs(yb).mean()
        print(f"M={m}: mean |int8-bf16| / mean|y| = {np.abs(yi - yb).mean() / denom:.4f}, "
              f"corr = {np.corrcoef(yb.ravel(), yi.ravel())[0,1]:.6f}", flush=True)

        for tag, fn in (("bf16", mlp_bf16), ("int8", mlp_int8)):
            dt = timed(fn, *args, steps=100)
            print(f"M={m} fwd {tag}: {dt*1e3:.3f} ms", flush=True)

        for tag, fn in (("bf16", mlp_bf16), ("int8", mlp_int8)):
            g = jax.grad(loss(fn), argnums=(0, 1, 3))

            def fb(x, *a):
                gs = g(x, *a)
                return sum(x.sum().astype(jnp.float32) for x in jax.tree.leaves(gs))

            dt = timed(fb, *args, steps=50)
            print(f"M={m} fwd+bwd {tag}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
