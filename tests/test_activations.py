"""tanh_gelu (saved-derivative custom VJP, ops/activations.py) must be a
drop-in for ``jax.nn.gelu(approximate=True)``: identical forward values
and AD-matching gradients, in fp32 and bf16."""

import jax
import jax.numpy as jnp
import numpy as np

from passt_tpu.ops.activations import tanh_gelu


def test_forward_matches_jax_gelu():
    x = jnp.linspace(-6, 6, 4097, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tanh_gelu(x)),
        np.asarray(jax.nn.gelu(x, approximate=True)),
        atol=1e-6, rtol=1e-6,
    )


def test_grad_matches_ad():
    x = jnp.linspace(-6, 6, 4097, dtype=jnp.float32)
    g_custom = jax.grad(lambda v: jnp.sum(tanh_gelu(v)))(x)
    g_ad = jax.grad(lambda v: jnp.sum(jax.nn.gelu(v, approximate=True)))(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ad), atol=2e-5)


def test_bf16_fwd_and_grad():
    x = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.bfloat16)
    h = tanh_gelu(x)
    assert h.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(h, np.float32),
        np.asarray(jax.nn.gelu(x, approximate=True), np.float32),
        atol=1e-2,
    )
    g_custom = jax.grad(lambda v: jnp.sum(tanh_gelu(v).astype(jnp.float32)))(x)
    g_ad = jax.grad(
        lambda v: jnp.sum(jax.nn.gelu(v, approximate=True).astype(jnp.float32))
    )(x)
    assert g_custom.dtype == jnp.bfloat16
    # one extra bf16 rounding on the saved residual
    np.testing.assert_allclose(
        np.asarray(g_custom, np.float32), np.asarray(g_ad, np.float32), atol=3e-2
    )


def test_model_grads_match_ad_path():
    """Full thin PaSST: params grads under the saved-deriv VJP equal the
    standard-AD tanh-GELU path (fp32)."""
    from passt_tpu.models.passt import PaSSTConfig, PaSST

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 128, 100))

    def grads(saved):
        cfg = PaSSTConfig(
            dtype="float32", gelu="tanh", gelu_saved_deriv=saved,
            embed_dim=64, depth=2, num_heads=2, s_patchout_t=0, s_patchout_f=0,
        )
        m = PaSST(cfg)
        p = m.init({"params": jax.random.PRNGKey(2)}, x, train=False)

        def loss(p):
            logits, _ = m.apply(p, x, train=False)
            return jnp.sum(logits ** 2)

        return jax.grad(loss)(p)

    g_saved, g_ad = grads(True), grads(False)
    for a, b in zip(jax.tree_util.tree_leaves(g_saved), jax.tree_util.tree_leaves(g_ad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
