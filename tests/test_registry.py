"""Registry surface tests: arch dispatch, lighten, ensembles, zoo metadata."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import passt_tpu.models.registry as registry
from passt_tpu.models.passt import PaSST, PaSSTConfig, init_passt
from passt_tpu.models.registry import (
    ARCHS,
    DEFAULT_CFGS,
    ENSEMBLES,
    ensemble_apply,
    get_model_config,
    lighten_params,
)


def test_zoo_covers_reference_checkpoints():
    # 17 PaSST checkpoints + the DeiT start point (reference passt.py:175-242)
    passt_entries = [k for k in DEFAULT_CFGS if "passt" in k or "openmic" in k]
    assert len(passt_entries) == 17
    for name, cfg in DEFAULT_CFGS.items():
        assert cfg["url"].startswith("https://")
        assert cfg["num_classes"] in (527, 20, 1000)


def test_arch_dispatch_and_stride_warning():
    cfg = get_model_config("passt_s_swa_p16_128_ap476")
    assert cfg.depth == 12 and cfg.stride == (10, 10)
    cfg = get_model_config("passt_l_kd_p16_128_ap47")
    assert cfg.depth == 7
    with pytest.warns(UserWarning, match="pre-trained with strides"):
        get_model_config("passt_s_swa_p16_s16_128_ap473", fstride=10, tstride=10)
    with pytest.raises(RuntimeError, match="Unknown model"):
        get_model_config("nope")


def test_lighten_params():
    """lighten_model semantics (reference passt.py:932-954): keep block 0 +
    blocks[cut+1:]; negative keeps strided interior."""
    params = {f"blocks_{i}": {"w": jnp.asarray(float(i))} for i in range(12)}
    params["norm"] = {"scale": jnp.asarray(1.0)}
    out, depth = lighten_params(params, 5)
    assert depth == 7  # PaSST-L
    kept = [float(out[f"blocks_{i}"]["w"]) for i in range(depth)]
    assert kept == [0.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0]
    assert "norm" in out and "blocks_7" not in out
    with pytest.raises(ValueError):
        lighten_params(params, 11)
    out_neg, depth_neg = lighten_params(params, -2)
    kept = [float(out_neg[f"blocks_{i}"]["w"]) for i in range(depth_neg)]
    assert kept[0] == 0.0 and kept[-1] == 11.0
    same, d0 = lighten_params(params, 0)
    assert d0 == 12 and same is params


def test_lighten_then_forward():
    cfg = PaSSTConfig(input_fdim=32, input_tdim=50, embed_dim=64, depth=4, num_heads=4, num_classes=8)
    model, params = init_passt(cfg, jax.random.PRNGKey(0))
    new_params, new_depth = lighten_params(params, 2)
    small = PaSST(dataclasses.replace(cfg, depth=new_depth))
    x = jnp.ones((1, 1, 32, 50))
    logits, _ = small.apply({"params": new_params}, x, train=False)
    assert logits.shape == (1, 8)


def test_ensemble_specs_match_reference():
    assert ENSEMBLES["ensemble_many"][1] == 0.4956
    assert len(ENSEMBLES["ensemble_many"][0]) == 9
    assert len(ENSEMBLES["ensemble_5"][0]) == 5
    strides = {s for _, s, _ in ENSEMBLES["ensemble_many"][0]}
    assert strides == {10, 12, 14, 16}


def test_ensemble_apply_averages_logits():
    cfg = PaSSTConfig(input_fdim=32, input_tdim=50, embed_dim=64, depth=1, num_heads=4, num_classes=8)
    pairs = []
    for i in range(3):
        model, params = init_passt(cfg, jax.random.PRNGKey(i))
        pairs.append((model, params))
    x = jnp.ones((2, 1, 32, 50))
    mean, mean2 = ensemble_apply(pairs, x)
    assert mean.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(mean2))
    individual = [np.asarray(m.apply({"params": p}, x, train=False)[0]) for m, p in pairs]
    np.testing.assert_allclose(np.asarray(mean), np.mean(individual, axis=0), atol=1e-6)


def test_gelu_option_resolution_and_equivalence():
    """gelu="auto" resolves to exact erf under fp32 (reference parity:
    torch nn.GELU, reference models/passt.py Mlp act_layer default) and to
    the tanh approximation under bf16, where the erf/tanh delta sits below
    bf16 rounding noise (measured on TPU: bf16-erf vs fp32-erf max logit
    delta 1.6e-2, bf16-tanh vs fp32-erf 1.7e-2) but the exact erf costs
    22% of the fwd+bwd step in VPU transcendentals."""
    import dataclasses

    assert PaSSTConfig(dtype="float32").gelu_approximate is False
    assert PaSSTConfig(dtype="bfloat16").gelu_approximate is True
    assert PaSSTConfig(dtype="bfloat16", gelu="erf").gelu_approximate is False
    assert PaSSTConfig(dtype="float32", gelu="tanh").gelu_approximate is True
    with pytest.raises(ValueError, match="gelu"):
        PaSSTConfig(gelu="bogus").gelu_approximate

    base = PaSSTConfig(
        input_fdim=32, input_tdim=50, embed_dim=64, depth=2, num_heads=4,
        num_classes=8, dtype="float32",
    )
    model, params = init_passt(base, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, 32, 50)), jnp.float32
    )
    ref, _ = model.apply({"params": params}, x, train=False)
    tanh_model = type(model)(dataclasses.replace(base, gelu="tanh"))
    out, _ = tanh_model.apply({"params": params}, x, train=False)
    # same params, different activation: close but not identical
    assert not np.array_equal(np.asarray(ref), np.asarray(out))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-2)


def test_gelu_flows_from_experiment_config():
    from passt_tpu.config import ExperimentConfig

    cfg = ExperimentConfig()
    assert cfg.model.gelu == "auto"
    assert cfg.passt_config().gelu_approximate is True  # bf16 default
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, gelu="erf")
    )
    assert cfg2.passt_config().gelu_approximate is False
