"""Fused Pallas attention vs the XLA einsum composition.

The XLA path in ``passt_tpu.models.passt.Attention`` is the behavioral
reference (itself parity-tested against the reference torch model in
test_model_parity.py); the fused kernel must match it — values AND
gradients — including the padding path (N not a lane multiple) and the
"+1 trick". Runs the real kernel in Pallas interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passt_tpu.ops.pallas.attention import fused_attention, kernel_supports


def xla_attention(q, k, v, scale, plus1=False):
    """The module's einsum composition (passt.py Attention, XLA branch)."""
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    if plus1:
        attn = jnp.concatenate(
            [attn, jnp.zeros(attn.shape[:-1] + (1,), attn.dtype)], axis=-1
        )
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    if plus1:
        attn = attn[..., :-1]
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def make_qkv(key, b, n, h, d, dtype):
    ks = jax.random.split(key, 3)
    return tuple(
        jax.random.normal(ks[i], (b, n, h, d), jnp.float32).astype(dtype)
        for i in range(3)
    )


@pytest.mark.parametrize("n", [128, 70, 300])
@pytest.mark.parametrize("plus1", [False, True])
def test_forward_matches_xla_fp32(n, plus1):
    q, k, v = make_qkv(jax.random.PRNGKey(0), 2, n, 3, 16, jnp.float32)
    scale = 16 ** -0.5
    got = fused_attention(q, k, v, scale=scale, plus1=plus1, interpret=True)
    want = xla_attention(q, k, v, scale, plus1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5)


def test_forward_matches_xla_bf16():
    q, k, v = make_qkv(jax.random.PRNGKey(1), 2, 130, 2, 32, jnp.bfloat16)
    scale = 32 ** -0.5
    got = fused_attention(q, k, v, scale=scale, interpret=True)
    want = xla_attention(q, k, v, scale)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("n", [128, 70])
@pytest.mark.parametrize("plus1", [False, True])
def test_gradients_match_xla(n, plus1):
    q, k, v = make_qkv(jax.random.PRNGKey(2), 2, n, 2, 16, jnp.float32)
    scale = 16 ** -0.5
    # A fixed projection makes the scalar loss sensitive to every output.
    w = jax.random.normal(jax.random.PRNGKey(3), (2, n, 2, 16), jnp.float32)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    fused = lambda q, k, v: fused_attention(
        q, k, v, scale=scale, plus1=plus1, interpret=True
    )
    ref = lambda q, k, v: xla_attention(q, k, v, scale, plus1)
    got = jax.grad(loss(fused), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=1e-5, rtol=1e-4, err_msg=f"d{name}"
        )


def test_gradients_past_bwd_vmem_cap_fall_back_to_xla():
    """jax.grad through an eval-length forward (N > _MAX_N_BWD, reachable
    via saliency/attribution on an eval-mode apply): the custom_vjp's
    backward must take its XLA-composition fallback instead of launching
    the Pallas backward past its VMEM ceiling — and match AD of the
    reference composition."""
    from passt_tpu.ops.pallas.attention import _MAX_N_BWD

    n = _MAX_N_BWD + 6
    assert kernel_supports(n, 8, backward=False)
    assert not kernel_supports(n, 8, backward=True)
    q, k, v = make_qkv(jax.random.PRNGKey(4), 1, n, 1, 8, jnp.float32)
    scale = 8 ** -0.5
    w = jax.random.normal(jax.random.PRNGKey(5), (1, n, 1, 8), jnp.float32)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    fused = lambda q, k, v: fused_attention(q, k, v, scale=scale, interpret=True)
    ref = lambda q, k, v: xla_attention(q, k, v, scale)
    got = jax.grad(loss(fused), argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=1e-5, rtol=1e-4, err_msg=f"d{name}"
        )


def test_kernel_supports_gating():
    assert kernel_supports(474, 64, backward=True)  # flagship train
    assert kernel_supports(1190, 64, backward=False)  # flagship eval
    assert not kernel_supports(1190, 64, backward=True)  # bwd VMEM cap
    assert not kernel_supports(474, 256, backward=True)  # head_dim > lane


def test_model_fused_matches_xla_logits_and_grads():
    """End-to-end through PaSST: attn_impl='fused' == 'xla' (fp32)."""
    from passt_tpu.models.passt import PaSST, PaSSTConfig

    base = dict(
        input_fdim=32, input_tdim=64, embed_dim=32, depth=2, num_heads=2,
        num_classes=5, patch_size=(8, 8), stride=(8, 8),
        s_patchout_t=2, s_patchout_f=1,
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 32, 64), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "patchout": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "droppath": jax.random.PRNGKey(3)}

    def run(attn_impl, train):
        model = PaSST(PaSSTConfig(attn_impl=attn_impl, **base))
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
            flat_x = jax.tree_util.tree_leaves(gx)
            flat_f = jax.tree_util.tree_leaves(gf)
            for a, b in zip(flat_f, flat_x):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
                )
