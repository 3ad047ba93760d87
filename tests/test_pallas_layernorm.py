"""Fused-backward Pallas LayerNorm vs nn.LayerNorm.

``nn.LayerNorm(epsilon=1e-6, dtype=float32)`` is the behavioral reference
(itself parity-tested against the reference torch blocks in
test_model_parity.py); the Pallas one-pass backward
(ops/pallas/layernorm.py) must match it — values AND gradients —
including the row-padding path (rows not a multiple of the 512 tile) and
bf16 inputs. Runs the real kernel in Pallas interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from passt_tpu.ops.pallas.layernorm import layer_norm


def ref_ln(x, scale, bias, eps=1e-6):
    """nn.LayerNorm's formulation (fp32 stats, var = max(E[x^2]-mu^2, 0))."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def make_inputs(key, shape, dtype):
    kx, ks, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, shape, jnp.float32).astype(dtype)
    scale = 1.0 + 0.1 * jax.random.normal(ks, (shape[-1],), jnp.float32)
    bias = 0.1 * jax.random.normal(kb, (shape[-1],), jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize(
    "shape", [(3, 37, 256), (2, 600, 128), (111, 256)]
)  # single padded tile / multi-tile with padding / 2-D leading
def test_forward_matches_xla_fp32(shape):
    x, scale, bias = make_inputs(jax.random.PRNGKey(0), shape, jnp.float32)
    got = layer_norm(x, scale, bias, interpret=True)
    want = ref_ln(x, scale, bias)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("shape", [(3, 37, 256), (2, 600, 128)])
def test_gradients_match_xla(shape):
    x, scale, bias = make_inputs(jax.random.PRNGKey(1), shape, jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)

    def loss(fn):
        return lambda x, s, b: jnp.sum(fn(x, s, b) * w)

    fused = lambda x, s, b: layer_norm(x, s, b, interpret=True)
    got = jax.grad(loss(fused), argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss(ref_ln), argnums=(0, 1, 2))(x, scale, bias)
    for g, wnt, name in zip(got, want, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_bf16_input_fp32_output_and_grads():
    """bf16 activations: fp32 output (nn.LayerNorm(dtype=float32) semantics),
    bf16 dx, fp32 param grads."""
    shape = (2, 130, 192)
    x, scale, bias = make_inputs(jax.random.PRNGKey(3), shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)

    y = layer_norm(x, scale, bias, interpret=True)
    assert y.dtype == jnp.float32
    y_ref = ref_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)

    def loss(fn):
        return lambda x, s, b: jnp.sum(fn(x, s, b) * w)

    fused = lambda x, s, b: layer_norm(x, s, b, interpret=True)
    got = jax.grad(loss(fused), argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss(ref_ln), argnums=(0, 1, 2))(x, scale, bias)
    assert got[0].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got[0], np.float32), np.asarray(want[0], np.float32),
        atol=3e-2, rtol=3e-2, err_msg="dx",
    )
    for g, wnt, name in zip(got[1:], want[1:], ("dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=1e-3, rtol=1e-3, err_msg=name
        )


def test_flax_module_param_compat():
    """FusedLayerNorm initializes the exact nn.LayerNorm param tree and
    computes the same outputs on shared params."""
    from passt_tpu.models.passt import FusedLayerNorm

    x = jax.random.normal(jax.random.PRNGKey(5), (4, 33, 64), jnp.float32)
    fused = FusedLayerNorm(epsilon=1e-6)
    xla = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
    pf = fused.init(jax.random.PRNGKey(0), x)
    px = xla.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(px)
    for a, b in zip(jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(px)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # Shared (non-trivial) params -> identical outputs.
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(6), p.shape), px
    )
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(xla.apply(params, x)),
        atol=1e-6,
    )


def test_model_fused_matches_xla_logits_and_grads():
    """End-to-end through PaSST: ln_impl='fused' == 'xla' (fp32)."""
    from passt_tpu.models.passt import PaSST, PaSSTConfig

    base = dict(
        input_fdim=32, input_tdim=64, embed_dim=32, depth=2, num_heads=2,
        num_classes=5, patch_size=(8, 8), stride=(8, 8),
        s_patchout_t=2, s_patchout_f=1,
    )
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 32, 64), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "patchout": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "droppath": jax.random.PRNGKey(3)}

    def run(ln_impl, train):
        model = PaSST(PaSSTConfig(ln_impl=ln_impl, **base))
        params = model.init(rngs, x, train=False)
        out = model.apply(params, x, train=train, rngs=rngs)[0]
        if not train:
            return np.asarray(out), None
        grad = jax.grad(
            lambda p: model.apply(p, x, train=True, rngs=rngs)[0].sum()
        )(params)
        return np.asarray(out), grad

    for train in (False, True):
        lx, gx = run("xla", train)
        lf, gf = run("fused", train)
        np.testing.assert_allclose(lf, lx, atol=1e-5, rtol=1e-5)
        if train:
            for a, b in zip(
                jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
                )
