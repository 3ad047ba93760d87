"""Forward-pass parity: our flax PaSST + checkpoint converter vs the
reference torch implementation (random-initialized oracle).

This is the strongest available oracle without network access: it proves the
architecture (patch conv, disentangled pos embeds, blocks, token averaging,
head structure) AND the state-dict converter simultaneously — any layout or
math mismatch breaks logit parity.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.models import PaSSTConfig, convert_torch_state_dict
from passt_tpu.models.passt import PaSST, init_passt

from reference_oracle import load_reference_passt_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference oracle (/root/reference + torch) unavailable"
)


def _build_pair(distilled=True, num_classes=527, tdim=998, stride=(10, 10), depth=12):
    import torch

    ref_passt = load_reference_passt_module()
    torch.manual_seed(0)
    ref = ref_passt.PaSST(
        img_size=(128, tdim), patch_size=16, stride=stride, in_chans=1,
        num_classes=num_classes, depth=depth, distilled=distilled,
    )
    ref.eval()
    cfg = PaSSTConfig(
        input_tdim=tdim, stride=stride, num_classes=num_classes,
        distilled=distilled, depth=depth,
    )
    _, init_params = init_passt(cfg, jax.random.PRNGKey(0))
    params = convert_torch_state_dict(ref.state_dict(), cfg, init_params=init_params)
    return ref, PaSST(cfg), params, cfg


@pytest.mark.parametrize("distilled", [True, False])
@pytest.mark.slow
def test_forward_parity(distilled, rng_np):
    import torch

    ref, model, params, cfg = _build_pair(distilled=distilled, tdim=198)
    x = rng_np.standard_normal((2, 1, 128, 198)).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_feats = ref(torch.from_numpy(x))
    logits, feats = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-4)


@pytest.mark.slow
def test_forward_parity_full_geometry(rng_np):
    """The flagship AudioSet geometry: (1, 128, 998) -> 12x99 grid + 2 tokens."""
    import torch

    ref, model, params, cfg = _build_pair(tdim=998)
    x = (rng_np.standard_normal((1, 1, 128, 998)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(x))
    logits, _ = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=5e-4)
    assert logits.shape == (1, 527)


@pytest.mark.slow
def test_time_embed_crop_parity(rng_np):
    """Eval-mode inputs shorter than the time embedding use its prefix
    (reference passt.py:520-521)."""
    import torch

    ref, model, params, cfg = _build_pair(tdim=998)
    x = rng_np.standard_normal((1, 1, 128, 500)).astype(np.float32)
    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(x))
    logits, _ = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=5e-4)


@pytest.mark.slow
def test_head_dist_params_ported():
    """head_dist exists in checkpoints though unused in forward — the
    converter must carry it for round-trip fidelity."""
    ref, model, params, cfg = _build_pair()
    ref_w = ref.state_dict()["head_dist.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["head_dist"]["kernel"]).T, ref_w)


@pytest.mark.slow
def test_patchout_shapes_and_semantics():
    """Train-mode patchout: static sequence lengths, token count math
    (reference passt.py:531-553)."""
    cfg = PaSSTConfig(
        input_tdim=998, s_patchout_t=40, s_patchout_f=4, u_patchout=10, num_classes=527
    )
    model, params = init_passt(cfg, jax.random.PRNGKey(0))
    # 12x99 grid -> (12-4)x(99-40) = 472 - 10 + 2 tokens = 464
    assert cfg.seq_len(train=True) == (12 - 4) * (99 - 40) - 10 + 2
    x = jnp.ones((1, 1, 128, 998))
    logits, feats = model.apply(
        {"params": params}, x, train=True,
        rngs={"patchout": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert logits.shape == (1, 527) and feats.shape == (1, 768)
    # Different patchout keys give different outputs; eval has none.
    logits2, _ = model.apply(
        {"params": params}, x, train=True,
        rngs={"patchout": jax.random.PRNGKey(9), "dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


@pytest.mark.slow
def test_imagenet_pos_embed_adaptation():
    """ImageNet-style checkpoints (no time_new_pos_embed) go through the
    bicubic grid adaptation (reference passt.py:656-706)."""
    import torch

    ref_passt = load_reference_passt_module()
    cfg = PaSSTConfig(input_tdim=998, num_classes=527, distilled=True)
    _, init_params = init_passt(cfg, jax.random.PRNGKey(0))

    torch.manual_seed(1)
    ref = ref_passt.PaSST(
        img_size=(128, 998), patch_size=16, stride=(10, 10), in_chans=1,
        num_classes=527, distilled=True,
    )
    sd = {k: v for k, v in ref.state_dict().items()}
    # Fabricate an ImageNet-style state dict: square grid pos_embed, RGB conv.
    for k in ("time_new_pos_embed", "freq_new_pos_embed", "new_pos_embed"):
        del sd[k]
    gs = 24
    sd["pos_embed"] = torch.randn(1, 2 + gs * gs, 768)
    sd["patch_embed.proj.weight"] = torch.randn(768, 3, 16, 16)

    params = convert_torch_state_dict(sd, cfg, init_params=init_params)
    assert params["time_new_pos_embed"].shape == (1, 1, 99, 768)
    assert params["freq_new_pos_embed"].shape == (1, 12, 1, 768)
    # Conv summed over RGB.
    np.testing.assert_allclose(
        np.asarray(params["patch_embed"]["proj"]["kernel"]).sum(),
        float(sd["patch_embed.proj.weight"].sum()),
        rtol=1e-3,
    )
    # Oracle for the adaptation math itself:
    tok, freq_ref, time_ref = ref_passt.adapt_image_pos_embed_to_passt(
        sd["pos_embed"], 2, (12, 99)
    )
    got_freq = np.asarray(params["freq_new_pos_embed"]).transpose(0, 3, 1, 2)
    got_time = np.asarray(params["time_new_pos_embed"]).transpose(0, 3, 1, 2)
    # Torch-exact bicubic (a=-0.75, half-pixel): demand tight agreement.
    np.testing.assert_allclose(got_freq, freq_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(got_time, time_ref.numpy(), atol=2e-5)


def test_num_classes_mismatch_drops_head():
    import torch

    ref_passt = load_reference_passt_module()
    torch.manual_seed(0)
    ref = ref_passt.PaSST(
        img_size=(128, 198), patch_size=16, stride=(10, 10), in_chans=1,
        num_classes=527, distilled=True,
    )
    cfg = PaSSTConfig(input_tdim=198, num_classes=50)
    _, init_params = init_passt(cfg, jax.random.PRNGKey(3))
    with pytest.warns(UserWarning, match="classifier dropped"):
        params = convert_torch_state_dict(ref.state_dict(), cfg, init_params=init_params)
    assert params["head_linear"]["kernel"].shape == (768, 50)
    np.testing.assert_array_equal(
        np.asarray(params["head_linear"]["kernel"]),
        np.asarray(init_params["head_linear"]["kernel"]),
    )


def test_pre_logits_representation_layer(rng_np):
    """Non-distilled ViT with a representation layer (passt.py:452-460):
    forward parity + converter handling of pre_logits.fc."""
    import torch

    ref_passt = load_reference_passt_module()
    torch.manual_seed(5)
    ref = ref_passt.PaSST(
        img_size=(128, 198), patch_size=16, stride=(10, 10), in_chans=1,
        num_classes=21, distilled=False, depth=2, embed_dim=192, num_heads=3,
        representation_size=96,
    )
    ref.eval()
    cfg = PaSSTConfig(
        input_tdim=198, num_classes=21, distilled=False, depth=2,
        embed_dim=192, num_heads=3, representation_size=96,
    )
    model, init_params = init_passt(cfg, jax.random.PRNGKey(0))
    assert "pre_logits" in init_params
    params = convert_torch_state_dict(ref.state_dict(), cfg, init_params=init_params)
    x = rng_np.standard_normal((1, 1, 128, 198)).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_feats = ref(torch.from_numpy(x))
    logits, feats = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=2e-4)


def test_plus1_attention_trick():
    """The '+1 trick' (reference PLUS1_TRICK, passt.py:295 + 349-355):
    softmax over [logits, 0] then drop the zero column. Off by default and
    a no-op flag must change outputs only when enabled."""
    cfg = PaSSTConfig(input_fdim=32, input_tdim=50, embed_dim=64, depth=2,
                      num_heads=4, num_classes=7)
    model, params = init_passt(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 1, 32, 50)), jnp.float32)
    base, _ = model.apply({"params": params}, x, train=False)

    cfg1 = dataclasses.replace(cfg, plus1_attn=True)
    model1 = type(model)(cfg1)
    out1, _ = model1.apply({"params": params}, x, train=False)  # same params
    assert out1.shape == base.shape
    assert not np.allclose(np.asarray(base), np.asarray(out1))

    # reference semantics oracle: torch cat-zero/softmax/slice on raw logits
    torch = pytest.importorskip("torch")
    logits = np.random.default_rng(6).standard_normal((2, 4, 9, 9)).astype(np.float32)
    t = torch.from_numpy(logits)
    t = torch.cat([t, torch.zeros(t.shape[:-1] + (1,))], dim=-1).softmax(dim=-1)[..., :-1]
    j = jax.nn.softmax(
        jnp.concatenate([jnp.asarray(logits), jnp.zeros((2, 4, 9, 1))], axis=-1), axis=-1
    )[..., :-1]
    np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=1e-6)
