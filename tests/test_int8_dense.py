"""Int8 quantized Dense (ops/pallas/int8_dense.py): exact quantized-product
semantics, STE gradients, and the fused-GELU epilogue's residual contract.
Runs the kernel in Pallas interpret mode on the CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.ops.pallas.int8_dense import (
    int8_dense,
    int8_dense_gelu,
    int8_dense_nd,
    quantize_cols,
    quantize_rows,
)


def _numpy_quant_ref(x, w, b):
    """The exact value the kernel must produce: int8 per-row/per-col
    symmetric quantization, int32 accumulation, f32 dequant + bias."""
    x = np.asarray(x, np.float32)
    w = np.asarray(w, np.float32)
    sx = np.abs(x).max(axis=1, keepdims=True) / 127.0
    sx = np.where(sx > 0, sx, 1.0)
    qx = np.clip(np.round(x / sx), -127, 127).astype(np.int8)
    sw = np.abs(w).max(axis=0, keepdims=True) / 127.0
    sw = np.where(sw > 0, sw, 1.0)
    qw = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    acc = qx.astype(np.int32) @ qw.astype(np.int32)
    return acc.astype(np.float32) * sx * sw + np.asarray(b, np.float32)


@pytest.fixture
def xwb(rng_np):
    m, k, n = 48, 64, 96
    x = rng_np.standard_normal((m, k)).astype(np.float32)
    w = (rng_np.standard_normal((k, n)) * 0.05).astype(np.float32)
    b = rng_np.standard_normal(n).astype(np.float32) * 0.01
    return x, w, b


def test_quantizers_roundtrip(rng_np):
    x = rng_np.standard_normal((8, 32)).astype(np.float32)
    q, s = quantize_rows(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s), x, atol=np.abs(x).max() / 127
    )
    qc, sc = quantize_cols(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(qc, np.float32) * np.asarray(sc), x, atol=np.abs(x).max() / 127
    )
    # zero rows: scale 1, all-zero q (no NaN)
    qz, sz = quantize_rows(jnp.zeros((2, 8)))
    assert np.all(np.asarray(qz) == 0) and np.all(np.asarray(sz) == 1.0)


def test_int8_dense_matches_quant_reference(xwb):
    x, w, b = xwb
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = _numpy_quant_ref(x, w, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and the quantized value approximates the real product
    exact = x @ w + b
    assert np.abs(got - exact).mean() < 0.02 * np.abs(exact).mean() + 1e-3


def test_int8_dense_row_padding(rng_np):
    """M not a multiple of the kernel's row block: padded rows are sliced
    back off and do not perturb real rows."""
    x = rng_np.standard_normal((130, 64)).astype(np.float32)
    w = (rng_np.standard_normal((64, 128)) * 0.05).astype(np.float32)
    b = np.zeros(128, np.float32)
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    assert got.shape == (130, 128)
    np.testing.assert_allclose(got, _numpy_quant_ref(x, w, b), rtol=1e-5, atol=1e-5)


def test_int8_dense_ste_gradients(xwb):
    """The backward is the STE: exact gradients of the UNQUANTIZED dense."""
    x, w, b = xwb
    xj, wj, bj = jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)

    def f(fn):
        return lambda x_, w_, b_: (fn(x_, w_, b_) * jnp.arange(w.shape[1])).sum()

    g_int8 = jax.grad(f(int8_dense), argnums=(0, 1, 2))(xj, wj, bj)
    g_ref = jax.grad(f(lambda a, c, d: a @ c + d), argnums=(0, 1, 2))(xj, wj, bj)
    for gi, gr in zip(g_int8, g_ref):
        # identical math, different matmul association order → fp32 rounding
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gr), rtol=1e-4, atol=1e-4)


def test_int8_dense_gelu_value_and_grad(xwb):
    """Fused-GELU forward == tanh_gelu of the quantized dense; backward uses
    the in-kernel saved derivative (one multiply) and equals AD of
    tanh-GELU(unquantized dense) up to the STE + quantization of d."""
    from passt_tpu.ops.activations import tanh_gelu

    x, w, b = xwb
    xj, wj, bj = jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)
    got = np.asarray(int8_dense_gelu(xj, wj, bj))
    zq = _numpy_quant_ref(x, w, b)
    want = np.asarray(tanh_gelu(jnp.asarray(zq)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def f(fn):
        return lambda x_, w_, b_: (fn(x_, w_, b_) ** 2).sum()

    g_int8 = jax.grad(f(int8_dense_gelu), argnums=(0, 1, 2))(xj, wj, bj)
    g_ref = jax.grad(
        f(lambda a, c, d: jax.nn.gelu(a @ c + d, approximate=True)), argnums=(0, 1, 2)
    )(xj, wj, bj)
    # quantization shifts z slightly, so compare with a quantization-scale
    # tolerance — direction and magnitude must survive
    for gi, gr in zip(g_int8, g_ref):
        gi, gr = np.asarray(gi), np.asarray(gr)
        assert np.abs(gi - gr).mean() < 0.05 * np.abs(gr).mean() + 1e-4


def test_int8_dense_nd_leading_dims(rng_np):
    x = rng_np.standard_normal((2, 5, 32)).astype(np.float32)
    w = (rng_np.standard_normal((32, 16)) * 0.1).astype(np.float32)
    b = np.zeros(16, np.float32)
    y = int8_dense_nd(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    assert y.shape == (2, 5, 16)
    flat = np.asarray(
        int8_dense(jnp.asarray(x.reshape(-1, 32)), jnp.asarray(w), jnp.asarray(b))
    )
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 16), flat, rtol=1e-6)
