"""Fused norm1+qkv+attention boundary (ops/pallas/ln_qkv.py).

Oracle: the exact unfused composition the module path runs —
``nn.LayerNorm(dtype=f32)`` -> cast -> qkv Dense -> flat attention kernel
(reference block semantics, models/passt.py:364-380). Kernels run in
Pallas interpret mode on CPU (same code path the TPU compiles).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.ops.pallas.ln_qkv import (
    fused_ln_qkv_attention,
    ln_qkv_supports,
)

B, N, H, D = 3, 47, 4, 16
C = H * D


def _inputs(rng_np, dtype=jnp.float32):
    x = jnp.asarray(rng_np.standard_normal((B, N, C)).astype(np.float32), dtype)
    s = jnp.asarray(1.0 + 0.1 * rng_np.standard_normal(C).astype(np.float32))
    bb = jnp.asarray(0.1 * rng_np.standard_normal(C).astype(np.float32))
    w = jnp.asarray(rng_np.standard_normal((C, 3 * C)).astype(np.float32) * 0.05, dtype)
    b = jnp.asarray(rng_np.standard_normal(3 * C).astype(np.float32) * 0.05, dtype)
    return x, s, bb, w, b


def _oracle(x, s, bb, w, b, plus1=False):
    """LN (fp32 fast-variance) -> qkv -> materialized softmax attention."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    xn = ((xf - mu) * jax.lax.rsqrt(var + jnp.float32(1e-6)) * s + bb).astype(x.dtype)
    qkv = (xn @ w + b).reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    a = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * (D ** -0.5)
    if plus1:
        a = jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (1,), a.dtype)], -1)
    a = jax.nn.softmax(a, axis=-1)
    if plus1:
        a = a[..., :-1]
    return jnp.einsum("bhnm,bmhd->bnhd", a.astype(x.dtype), v).reshape(B, N, C)


@pytest.mark.parametrize("plus1", [False, True])
def test_forward_matches_oracle(rng_np, plus1):
    x, s, bb, w, b = _inputs(rng_np)
    got = fused_ln_qkv_attention(
        x, s, bb, w, b, heads=H, head_dim=D, scale=D ** -0.5, plus1=plus1
    )
    want = _oracle(x, s, bb, w, b, plus1=plus1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gradients_match_oracle(rng_np):
    x, s, bb, w, b = _inputs(rng_np)
    t = jnp.asarray(rng_np.standard_normal((B, N, C)).astype(np.float32))

    def f_fused(x, s, bb, w, b):
        o = fused_ln_qkv_attention(
            x, s, bb, w, b, heads=H, head_dim=D, scale=D ** -0.5
        )
        return jnp.sum(o * t)

    def f_oracle(x, s, bb, w, b):
        return jnp.sum(_oracle(x, s, bb, w, b) * t)

    g_f = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, s, bb, w, b)
    g_o = jax.grad(f_oracle, argnums=(0, 1, 2, 3, 4))(x, s, bb, w, b)
    for name, a, o in zip(("dx", "dscale", "dbias", "dw", "db"), g_f, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(o), atol=3e-4, rtol=2e-4, err_msg=name
        )


def test_supports_gate():
    # flagship train geometry fits fwd+bwd at bf16
    assert ln_qkv_supports(474, 12, 64, backward=True, itemsize=2, batch=12)
    # eval geometry (N=1190) does not — falls back to the module path
    assert not ln_qkv_supports(1190, 12, 64, backward=False, itemsize=2, batch=20)
    # fp32 backward at flagship geometry exceeds the budget
    assert not ln_qkv_supports(474, 12, 64, backward=True, itemsize=4, batch=12)


def test_model_fused_path_selected_and_equal(rng_np):
    """End-to-end through PaSST: fuse_ln_qkv=True takes the kernel path
    (asserted via trace counting on the pallas primitive) and reproduces
    the module path's logits."""
    from passt_tpu.models.passt import PaSSTConfig, init_passt

    kw = dict(input_fdim=64, input_tdim=100, embed_dim=64, depth=2,
              num_heads=4, num_classes=11, dtype="float32", attn_impl="fused")
    m_a, p = init_passt(PaSSTConfig(**kw), jax.random.PRNGKey(0))
    m_b, _ = init_passt(PaSSTConfig(**kw, fuse_ln_qkv=True), jax.random.PRNGKey(0))
    x = jnp.asarray(rng_np.standard_normal((2, 1, 64, 100)).astype(np.float32))
    lo_a, _ = m_a.apply({"params": p}, x, train=False)
    lo_b, _ = m_b.apply({"params": p}, x, train=False)
    np.testing.assert_allclose(np.asarray(lo_a), np.asarray(lo_b), atol=2e-5)

    # the fused path must actually run the F1 kernel: count pallas calls
    # in the jaxpr (2 blocks x (F1 + attention fwd) = 4 vs 2 unfused)
    jaxpr_b = jax.make_jaxpr(
        lambda p, x: m_b.apply({"params": p}, x, train=False)
    )(p, x)
    jaxpr_a = jax.make_jaxpr(
        lambda p, x: m_a.apply({"params": p}, x, train=False)
    )(p, x)

    def count_pallas(jaxpr):
        # robust across jax versions: count kernel call sites in the
        # pretty-printed jaxpr (each pallas_call eqn prints once)
        return str(jaxpr).count("pallas_call")

    assert count_pallas(jaxpr_b.jaxpr) == count_pallas(jaxpr_a.jaxpr) + 2


def test_contradictory_configs_raise():
    """fuse_ln_qkv must fail loudly on configs it cannot honor instead of
    silently running unfused (round-5 review finding)."""
    from passt_tpu.models.passt import PaSSTConfig

    with pytest.raises(NotImplementedError, match="ln_impl"):
        PaSSTConfig(fuse_ln_qkv=True, ln_impl="fused").use_scan_blocks
    with pytest.raises(NotImplementedError, match="attn_impl"):
        PaSSTConfig(fuse_ln_qkv=True, attn_impl="xla").use_scan_blocks


def test_ln_stats_clamps_negative_fast_variance():
    """Near-constant large-magnitude rows make the unclamped fast variance
    NEGATIVE under fp32 cancellation (x = 120 + N(0, 1e-3), C=768: true
    var 1e-6, unclamped fp32 estimate ~-3e-3) and rsqrt returns NaN.
    ln_stats must clamp like flax nn.LayerNorm does (round-5 review
    finding, verified by execution)."""
    from passt_tpu.ops.pallas.ln_qkv import ln_stats

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        120.0 + rng.standard_normal((4, 768)).astype(np.float32) * 1e-3
    )
    mu, rstd = ln_stats(x, 1e-6)
    assert bool(jnp.isfinite(rstd).all())
    assert bool(jnp.isfinite(mu).all())
