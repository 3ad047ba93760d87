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

from passt_tpu.ops.pallas.attention import (
    flat_kernel_supports,
    fused_attention,
    fused_attention_qkv,
    kernel_supports,
)


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


def xla_attention_flat(qkv_flat, heads, head_dim, scale, plus1=False):
    """The einsum composition from the raw qkv Dense output layout."""
    b, n, _ = qkv_flat.shape
    qkv = qkv_flat.reshape(b, n, 3, heads, head_dim)
    out = xla_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale, plus1)
    return out.reshape(b, n, heads * head_dim)


@pytest.mark.parametrize("n", [128, 70, 300])
@pytest.mark.parametrize("plus1", [False, True])
def test_flat_forward_matches_xla_fp32(n, plus1):
    heads, d = 3, 16
    qkv = jax.random.normal(jax.random.PRNGKey(0), (2, n, 3 * heads * d), jnp.float32)
    scale = d ** -0.5
    got = fused_attention_qkv(
        qkv, heads=heads, head_dim=d, scale=scale, plus1=plus1, interpret=True
    )
    want = xla_attention_flat(qkv, heads, d, scale, plus1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5)


def test_flat_forward_matches_xla_bf16():
    heads, d = 2, 32
    qkv = jax.random.normal(
        jax.random.PRNGKey(1), (2, 130, 3 * heads * d), jnp.float32
    ).astype(jnp.bfloat16)
    scale = d ** -0.5
    got = fused_attention_qkv(qkv, heads=heads, head_dim=d, scale=scale, interpret=True)
    want = xla_attention_flat(qkv, heads, d, scale)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("n", [128, 70])
@pytest.mark.parametrize("plus1", [False, True])
def test_flat_gradients_match_xla(n, plus1):
    """The custom VJP's dqkv (emitted in the Dense-backward layout by one
    kernel) == AD of the einsum composition."""
    heads, d = 2, 16
    qkv = jax.random.normal(jax.random.PRNGKey(2), (2, n, 3 * heads * d), jnp.float32)
    scale = d ** -0.5
    w = jax.random.normal(jax.random.PRNGKey(3), (2, n, heads * d), jnp.float32)

    fused = lambda x: jnp.sum(
        fused_attention_qkv(
            x, heads=heads, head_dim=d, scale=scale, plus1=plus1, interpret=True
        )
        * w
    )
    ref = lambda x: jnp.sum(xla_attention_flat(x, heads, d, scale, plus1) * w)
    got = jax.grad(fused)(qkv)
    want = jax.grad(ref)(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_flat_gradients_past_bwd_vmem_cap_fall_back_to_xla():
    """Differentiating a forward selected under backward=False gating
    (saliency through an eval-mode apply): the flat kernel's backward must
    take its XLA fallback past the VMEM budget — and match AD exactly."""
    heads, d = 12, 64
    n = 420  # fwd fits the flat budget at fp32, bwd does not
    assert flat_kernel_supports(n, heads, d, backward=False, itemsize=4)
    assert not flat_kernel_supports(n, heads, d, backward=True, itemsize=4)
    qkv = jax.random.normal(jax.random.PRNGKey(4), (1, n, 3 * heads * d), jnp.float32)
    scale = d ** -0.5
    w = jax.random.normal(jax.random.PRNGKey(5), (1, n, heads * d), jnp.float32)

    fused = lambda x: jnp.sum(
        fused_attention_qkv(x, heads=heads, head_dim=d, scale=scale, interpret=True) * w
    )
    ref = lambda x: jnp.sum(xla_attention_flat(x, heads, d, scale) * w)
    got = jax.grad(fused)(qkv)
    want = jax.grad(ref)(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_flat_kernel_supports_gating():
    # flagship train geometry (bf16): flat kernel on, fwd and bwd
    assert flat_kernel_supports(474, 12, 64, backward=True, itemsize=2)
    # flagship eval (N=1190): full-row blocks exceed VMEM -> [B,H,N,D] kernel
    assert not flat_kernel_supports(1190, 12, 64, backward=False, itemsize=2)
    assert kernel_supports(1190, 64, backward=False)
    # 30-sec models' train geometry (N=2074): beyond both kernels -> XLA
    assert not flat_kernel_supports(2074, 12, 64, backward=True, itemsize=2)
    assert not kernel_supports(2074, 64, backward=True)
    # lane-slicing grain: head_dim must be a sublane multiple
    assert not flat_kernel_supports(128, 4, 12, backward=False, itemsize=2)
    # forward output residence (eval graphs pin the [B,N,C] output in
    # scoped VMEM): B=20 @ N=590 OOMed on chip (19.5 MiB vs the 16 MiB
    # limit) -> rejected; the train geometry stays selected
    assert flat_kernel_supports(474, 12, 64, backward=False, itemsize=2, batch=12)
    assert not flat_kernel_supports(590, 12, 64, backward=False, itemsize=2, batch=20)
    # batch=None / symbolic batch keeps the prior (n-only) gating
    assert flat_kernel_supports(590, 12, 64, backward=False, itemsize=2)
    # bad geometry raises
    with pytest.raises(ValueError):
        fused_attention_qkv(
            jnp.zeros((1, 8, 100)), heads=2, head_dim=16, scale=0.25, interpret=True
        )


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
