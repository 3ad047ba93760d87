"""jax.export serving artifacts: symbolic-batch StableHLO round trip,
manifest contract, fixed-batch export, and the full-arch export path.

The reference has no ahead-of-time deployment format (inference =
hear21passt torch module + checkpoint, README.md:48-65); the exported
artifact is the TPU-native replacement, so these tests oracle it against
the live model it was lowered from."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from passt_tpu.export import export_model, load_exported, read_manifest
from passt_tpu.hear import make_inference_fn
from passt_tpu.models.passt import PaSSTConfig, init_passt
from passt_tpu.ops.frontend import MelConfig

TINY = PaSSTConfig(
    input_fdim=64,
    input_tdim=48,
    embed_dim=64,
    depth=2,
    num_heads=4,
    num_classes=11,
    # patchout configured on purpose: must NOT leak into the eval export
    s_patchout_t=2,
    s_patchout_f=1,
)


TINY_MEL = MelConfig(stft_method="matmul", n_mels=TINY.input_fdim,
                     fmin_aug_range=10, fmax_aug_range=2000)


@pytest.fixture(scope="module")
def tiny_export(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export") / "tiny")
    model, params = init_passt(TINY, jax.random.PRNGKey(0))
    seconds = 0.5
    artifact, manifest = export_model(
        model, params, TINY, out, platforms=("cpu",), seconds=seconds, batch="b",
        mel_cfg=TINY_MEL,
    )
    return out, model, params, seconds


def test_export_roundtrip_matches_live_model(tiny_export):
    out, model, params, seconds = tiny_export
    fn = load_exported(out)
    infer = make_inference_fn(model, TINY_MEL, TINY.input_tdim)
    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch: one artifact, several batch sizes
        wave = jnp.asarray(
            rng.standard_normal((b, int(seconds * TINY_MEL.sr))).astype(np.float32)
        )
        logits, feats = fn(wave)
        ref_logits, ref_feats = infer(params, wave)
        assert logits.shape == (b, TINY.num_classes)
        assert feats.shape == (b, TINY.embed_dim)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(feats), np.asarray(ref_feats), atol=1e-5)


def test_export_manifest_contract(tiny_export):
    out, _, _, seconds = tiny_export
    m = read_manifest(out)
    assert m["platforms"] == ["cpu"]
    assert m["sample_rate"] == 32000
    assert m["input"]["shape"] == [None, int(seconds * 32000)]
    assert m["outputs"] == {"logits": TINY.num_classes, "features": TINY.embed_dim}
    # the artifact is self-describing enough to validate inputs without
    # deserializing the HLO
    assert m["jax_version"] == jax.__version__


def test_export_fixed_batch(tmp_path):
    cfg = dataclasses.replace(TINY, s_patchout_t=0, s_patchout_f=0)
    model, params = init_passt(cfg, jax.random.PRNGKey(1))
    out = str(tmp_path / "fixed")
    export_model(model, params, cfg, out, platforms=("cpu",), seconds=0.5, batch=2)
    m = read_manifest(out)
    assert m["input"]["shape"][0] == 2
    fn = load_exported(out)
    wave = jnp.zeros((2, 16000), jnp.float32)
    logits, _ = fn(wave)
    assert logits.shape == (2, cfg.num_classes)
    with pytest.raises(Exception):  # fixed-batch artifact rejects batch 3
        fn(jnp.zeros((3, 16000), jnp.float32))


@pytest.mark.slow
def test_export_full_arch_cli(tmp_path):
    """The CLI path on the real flagship arch (86M params; random init —
    checkpoint porting is covered by test_checkpoint_port)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "export_inference_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "export_inference.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    out = str(tmp_path / "flagship")
    cli.main(
        [
            "--arch",
            "passt_s_swa_p16_128_ap476",
            "--out",
            out,
            "--platforms",
            "cpu",
            "--seconds",
            "1.0",
        ]
    )
    m = read_manifest(out)
    assert m["arch"] == "passt_s_swa_p16_128_ap476"
    assert m["pretrained"] is False
    fn = load_exported(out)
    logits, feats = fn(jnp.zeros((2, 32000), jnp.float32))
    assert logits.shape == (2, 527) and feats.shape == (2, 768)


def test_export_ensemble_roundtrip(tmp_path):
    """Ensemble export: one artifact = shared mel + N members + logit mean
    (reference EnsembelerModel passt.py:1021-1036; ensemble configs
    config_updates.py:136-222). Members tiny-fied via the ARCHS registry
    like tests/test_hear.py does."""
    import passt_tpu.models.registry as registry
    from passt_tpu.export import export_ensemble
    from passt_tpu.models.registry import ensemble_apply, get_ensemble_model
    from passt_tpu.ops.frontend import log_mel_spectrogram

    members = registry.ENSEMBLES["ensemble_s16_14"][0]
    saved = {}
    try:
        for arch, _, _ in members:
            saved[arch] = registry.ARCHS[arch]
            registry.ARCHS[arch] = dataclasses.replace(
                saved[arch], depth=1, embed_dim=64, num_heads=4
            )
        out = str(tmp_path / "ens")
        export_ensemble(
            "ensemble_s16_14", out, platforms=("cpu",), seconds=0.5,
            n_classes=7, input_fdim=64, input_tdim=48,
        )
        m = read_manifest(out)
        assert m["ensemble"] == "ensemble_s16_14"
        assert m["published_map"] == 0.48579
        assert [tuple(x) for x in m["members"]] == members
        assert m["outputs"] == {"logits": 7}

        fn = load_exported(out)
        wave = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 16000)).astype(np.float32)
        )
        logits = fn(wave)
        assert logits.shape == (2, 7)

        # oracle: mean of member logits on the shared eval-mode mel
        pairs = get_ensemble_model(
            members, rng=jax.random.PRNGKey(0),
            n_classes=7, input_fdim=64, input_tdim=48, dtype="float32",
        )
        from passt_tpu.hear import default_inference_mel_cfg

        mel_cfg = dataclasses.replace(
            default_inference_mel_cfg(members[0][0]),
            n_mels=64, stft_method="matmul",
        )
        mel = log_mel_spectrogram(wave, mel_cfg, train=False)[:, None, :, :48]
        ref, _ = ensemble_apply(pairs, mel)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-5)
    finally:
        for arch, spec in saved.items():
            registry.ARCHS[arch] = spec


def test_export_external_weights_roundtrip(tmp_path):
    """bake_weights=False: the artifact stays small (params in a sidecar
    .npz, loaded transparently by load_exported) and matches the baked
    variant — needed where a compile service bounds module size (the axon
    remote-compile rejects ~350 MB constant blobs) and to serve many
    checkpoints of one arch from one artifact."""
    import os

    from passt_tpu.export import ARTIFACT_SUFFIX, PARAMS_SUFFIX

    model, params = init_passt(TINY, jax.random.PRNGKey(0))
    baked = str(tmp_path / "baked")
    ext = str(tmp_path / "ext")
    export_model(model, params, TINY, baked, platforms=("cpu",), seconds=0.5,
                 batch="b", mel_cfg=TINY_MEL)
    export_model(model, params, TINY, ext, platforms=("cpu",), seconds=0.5,
                 batch="b", mel_cfg=TINY_MEL, bake_weights=False)
    assert os.path.exists(ext + PARAMS_SUFFIX)
    # the external artifact excludes the weight constants (at this tiny
    # scale the HLO text dominates, so just strictly smaller; at 86M the
    # difference is ~350 MB vs ~4 MB)
    assert os.path.getsize(ext + ARTIFACT_SUFFIX) < os.path.getsize(baked + ARTIFACT_SUFFIX)
    assert read_manifest(ext)["weights"] == "external"
    assert read_manifest(baked)["weights"] == "baked"

    wave = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16000)).astype(np.float32)
    )
    lb, fb = load_exported(baked)(wave)
    le, fe = load_exported(ext)(wave)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(le), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fe), atol=1e-6)


def test_serve_cli_end_to_end(tmp_path, rng_np):
    """scripts/serve.py: directory of wavs -> exported artifact ->
    predictions.npz, with pad/truncate/resample to the artifact's manifest
    contract and a ragged final batch."""
    import importlib.util
    import os
    import wave as wavemod

    model, params = init_passt(TINY, jax.random.PRNGKey(0))
    out = str(tmp_path / "art")
    export_model(model, params, TINY, out, platforms=("cpu",), seconds=0.5,
                 batch="b", mel_cfg=TINY_MEL)

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i, (n, rate) in enumerate([(16000, 32000), (8000, 32000), (8000, 16000)]):
        x = (rng_np.standard_normal(n) * 3000).astype(np.int16)
        with wavemod.open(str(wav_dir / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(x.tobytes())

    spec = importlib.util.spec_from_file_location(
        "serve_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "serve.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    out_npz = str(tmp_path / "pred.npz")
    cli.main(["--artifact", out, "--wav-dir", str(wav_dir),
              "--out", out_npz, "--batch", "2", "--probs"])
    data = np.load(out_npz)
    assert list(data["names"]) == ["c0.wav", "c1.wav", "c2.wav"]
    assert data["out"].shape == (3, TINY.num_classes)
    assert ((data["out"] >= 0) & (data["out"] <= 1)).all()  # --probs


def test_load_exported_needs_only_jax(tiny_export):
    """The serving contract: deserializing + calling an artifact must not
    import flax/torch/model code — a subprocess with those modules blocked
    loads and executes the artifact."""
    import os
    import subprocess
    import sys
    import textwrap

    out, _, _, seconds = tiny_export
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = textwrap.dedent(
        f"""
        import os, sys
        sys.path.insert(0, {repo!r})
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as xb
        xb._clear_backends()
        class Blocker:
            def find_module(self, name, path=None):
                if name.split(".")[0] in ("flax", "torch", "optax", "orbax"):
                    raise ImportError(f"blocked: {{name}}")
        sys.meta_path.insert(0, Blocker())
        import numpy as np
        from passt_tpu.export import load_exported, read_manifest
        m = read_manifest({out!r} + ".passt.hlo")   # .hlo path form accepted
        fn = load_exported({out!r})
        logits, feats = fn(np.zeros((2, m["input"]["shape"][1]), np.float32))
        assert logits.shape == (2, m["outputs"]["logits"])
        print("jax-only load OK")
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "jax-only load OK" in proc.stdout
