"""Micro A/B: the attention op alone (train geometry B=12, H=12, N=474,
D=64, bf16) — fused Pallas kernel vs the XLA einsum composition, fwd and
fwd+bwd, differenced in-jit timing. Isolates where the full-step delta
comes from. Usage: python -u scripts/ab_attention_micro.py [N]"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import timed  # the differenced in-jit harness

from passt_tpu.ops.pallas.attention import fused_attention

B, H, D = 12, 12, 64
N = int(sys.argv[1]) if len(sys.argv) > 1 else 474
SCALE = D ** -0.5


def xla_attention(q, k, v):
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * SCALE
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def main():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16) for _ in range(3)
    )
    w = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)

    fwd_fused = lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, scale=SCALE).astype(jnp.float32) * w.astype(jnp.float32)
    )
    fwd_xla = lambda q, k, v: jnp.sum(
        xla_attention(q, k, v).astype(jnp.float32) * w.astype(jnp.float32)
    )
    grad_fused = jax.grad(fwd_fused, argnums=(0, 1, 2))
    grad_xla = jax.grad(fwd_xla, argnums=(0, 1, 2))
    gsum = lambda g: sum(jnp.sum(x.astype(jnp.float32)) for x in g)

    for name, fn in [
        ("fwd xla  ", fwd_xla),
        ("fwd fused", fwd_fused),
        ("bwd xla  ", lambda *a: gsum(grad_xla(*a))),
        ("bwd fused", lambda *a: gsum(grad_fused(*a))),
    ]:
        ms = timed(fn, q, k, v, steps=30) * 1e3
        print(f"{name}: {ms:.3f} ms  (x12 blocks = {ms*12:.2f} ms)", flush=True)


if __name__ == "__main__":
    print(f"B={B} H={H} N={N} D={D} backend={jax.default_backend()}", flush=True)
    main()
