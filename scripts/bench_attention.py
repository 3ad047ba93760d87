"""A/B the attention inner kernel at PaSST-S train shapes on the real chip:
XLA einsum + fp32 softmax (current) vs the Pallas TPU flash-attention
kernel (jax.experimental.pallas.ops.tpu.flash_attention) with the sequence
padded 474 -> 512 and pad keys masked via segment ids.

Shapes: [B=12, H=12, N=474, dh=64] bfloat16.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scripts.profile_step import timed  # differenced timing harness

B, H, N, DH = 12, 12, 474, 64
NPAD = 512


def xla_attn(q, k, v):
    # current path: [B, H, N, dh]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (DH ** -0.5)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def make_flash():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    seg_q = jnp.ones((B, NPAD), jnp.int32).at[:, N:].set(0)
    seg = SegmentIds(q=seg_q, kv=seg_q)

    def attn(q, k, v):
        pad = [(0, 0), (0, 0), (0, NPAD - N), (0, 0)]
        qp = jnp.pad(q, pad)
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        out = flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=DH ** -0.5)
        return out[:, :, :N, :]

    return attn


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, DH)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, DH)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, DH)), jnp.bfloat16)

    flash = make_flash()

    # numerical parity first
    a = np.asarray(xla_attn(q, k, v), np.float32)
    b = np.asarray(flash(q, k, v), np.float32)
    print("max abs diff xla vs flash:", float(np.abs(a - b).max()), flush=True)

    for name, fn in [("xla", xla_attn), ("flash", flash)]:
        dt = timed(fn, q, k, v, steps=100)
        print(f"{name}_fwd_ms {dt*1e3:.3f}", flush=True)

    def mk_bwd(fn):
        def loss(q, k, v):
            return (fn(q, k, v).astype(jnp.float32) ** 2).mean()

        g = jax.grad(loss, argnums=(0, 1, 2))

        def fwd_bwd(q, k, v):
            return g(q, k, v)

        return fwd_bwd

    for name, fn in [("xla", xla_attn), ("flash", flash)]:
        dt = timed(mk_bwd(fn), q, k, v, steps=60)
        print(f"{name}_fwd_bwd_ms {dt*1e3:.3f}", flush=True)


if __name__ == "__main__":
    main()
