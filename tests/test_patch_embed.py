"""Patch-embed formulations: the unfold (strided-slice im2col + one MXU
matmul) and conv (XLA conv) implementations must share the exact nn.Conv
parameter layout and produce equal outputs — checkpoints are
interchangeable (reference conv: models/passt.py:285-303 PatchEmbed).
"""

import jax
import jax.numpy as jnp
import numpy as np

from passt_tpu.models.passt import PaSSTConfig, PaSST, PatchEmbed


def test_unfold_matches_conv_patch_level():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 100, 1))  # NHWC
    conv = PatchEmbed(768, (16, 16), (10, 10), 1, dtype=jnp.float32, unfold=False)
    p = conv.init(jax.random.PRNGKey(1), x)
    out_c = conv.apply(p, x)
    # same params, unfold formulation
    unf = PatchEmbed(768, (16, 16), (10, 10), 1, dtype=jnp.float32, unfold=True)
    out_u = unf.apply(p, x)
    assert out_c.shape == out_u.shape == (2, 12, 9, 768)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_u), atol=5e-6)


def test_unfold_matches_conv_mixed_crop_pad_axes():
    """Geometry where one axis needs cropping and the other padding
    (64x48 @ 16/10: fp=60<64, tp=50>48) — regression for the negative
    jnp.pad width this produced when both axes shared one branch."""
    for f, t in ((64, 48), (48, 64), (48, 48), (64, 64)):
        x = jax.random.normal(jax.random.PRNGKey(4), (2, f, t, 1))
        conv = PatchEmbed(32, (16, 16), (10, 10), 1, dtype=jnp.float32, unfold=False)
        p = conv.init(jax.random.PRNGKey(5), x)
        out_c = conv.apply(p, x)
        unf = PatchEmbed(32, (16, 16), (10, 10), 1, dtype=jnp.float32, unfold=True)
        out_u = unf.apply(p, x)
        assert out_c.shape == out_u.shape, (f, t)
        np.testing.assert_allclose(
            np.asarray(out_c), np.asarray(out_u), atol=5e-6, err_msg=f"{(f, t)}"
        )


def test_unfold_param_tree_identical_to_conv():
    """Checkpoints (and the torch converter, which targets the conv layout)
    load into either implementation unchanged."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 128, 100))
    trees = {}
    for impl in ("conv", "unfold"):
        cfg = PaSSTConfig(
            dtype="float32", patch_embed_impl=impl,
            s_patchout_t=0, s_patchout_f=0, embed_dim=64, depth=1, num_heads=2,
        )
        p = PaSST(cfg).init({"params": jax.random.PRNGKey(1)}, x, train=False)
        trees[impl] = p
    assert jax.tree_util.tree_structure(trees["conv"]) == jax.tree_util.tree_structure(
        trees["unfold"]
    )
    shapes = [
        (a.shape, b.shape)
        for a, b in zip(jax.tree_util.tree_leaves(trees["conv"]),
                        jax.tree_util.tree_leaves(trees["unfold"]))
    ]
    assert all(a == b for a, b in shapes)


def test_unfold_grad_matches_conv():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 50, 1))
    conv = PatchEmbed(32, (16, 16), (10, 10), 1, dtype=jnp.float32, unfold=False)
    p = conv.init(jax.random.PRNGKey(3), x)
    unf = PatchEmbed(32, (16, 16), (10, 10), 1, dtype=jnp.float32, unfold=True)

    def loss(params, mod):
        return jnp.sum(mod.apply(params, x) ** 2)

    g_c = jax.grad(loss)(p, conv)
    g_u = jax.grad(loss)(p, unf)
    for a, b in zip(jax.tree_util.tree_leaves(g_c), jax.tree_util.tree_leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
