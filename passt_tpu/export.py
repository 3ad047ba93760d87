"""Serialized inference artifacts via ``jax.export`` (StableHLO).

The reference's deployment story is the ``hear21passt`` pip package: a
torch module reloaded from a checkpoint in a Python environment with the
full framework installed (reference README.md:48-65). The TPU-native
equivalent is an ahead-of-time *exported artifact*: the complete inference
function — on-device mel frontend + PaSST forward, weights baked in — is
lowered to StableHLO once and serialized to a single file that any JAX
runtime can deserialize and call **without this package installed at
all**, on the platforms chosen at export time (TPU and/or CPU), with a
symbolic batch dimension so one artifact serves any batch size.

Produces ``<out>.passt.hlo`` (the serialized function) plus
``<out>.passt.json`` (a manifest with the arch, audio contract and
platforms, so a serving layer can validate inputs without deserializing).

CLI: ``python scripts/export_inference.py --arch ... --out model`` (see
that script for the push-button path); library surface below.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

MANIFEST_SUFFIX = ".passt.json"
ARTIFACT_SUFFIX = ".passt.hlo"


def make_inference_fn(model, mel_cfg, seconds: float, input_tdim: int):
    """waveform [B, seconds*sr] float32 -> (logits [B, C], features [B, D]);
    eval-mode mel (no SpecAugment / mel-range jitter) + eval-mode forward
    (no patchout) — the reference's inference contract (hear21passt
    ``model(wave) -> logits``, README.md:48-65)."""
    from passt_tpu.ops.frontend import log_mel_spectrogram

    def infer(params, wave):
        mel = log_mel_spectrogram(wave, mel_cfg, train=False)
        logits, features = model.apply(
            {"params": params}, mel[:, None, :, :input_tdim], train=False
        )
        return logits, features

    return infer


def export_inference(
    arch: str,
    out_path: str,
    checkpoint_path: Optional[str] = None,
    platforms: Sequence[str] = ("tpu",),
    seconds: float = 10.0,
    dtype: str = "float32",
    batch: Optional[str] = "b",
    rng: Optional[jax.Array] = None,
    mel_method: str = "matmul",
    **overrides,
) -> Tuple[str, str]:
    """Export one registry arch (optionally with ported weights) to a
    serialized StableHLO artifact + JSON manifest. ``batch="b"`` exports a
    symbolic batch dimension (one artifact, any batch size); pass an int
    for a fixed-batch artifact. Returns (artifact_path, manifest_path)."""
    from passt_tpu.models.registry import get_model, get_model_config

    cfg = get_model_config(arch, dtype=dtype, **overrides)
    model, params = get_model(
        arch,
        pretrained=checkpoint_path is not None,
        checkpoint_path=checkpoint_path,
        rng=rng,
        dtype=dtype,
        **overrides,
    )
    return export_model(
        model,
        params,
        cfg,
        out_path,
        platforms=platforms,
        seconds=seconds,
        batch=batch,
        mel_method=mel_method,
        manifest_extra={"arch": arch, "pretrained": checkpoint_path is not None},
    )


def export_model(
    model,
    params,
    cfg,
    out_path: str,
    platforms: Sequence[str] = ("tpu",),
    seconds: float = 10.0,
    batch: Optional[str] = "b",
    mel_method: str = "matmul",
    manifest_extra: Optional[dict] = None,
) -> Tuple[str, str]:
    """Lower + serialize an already-built (model, params). ``cfg`` is its
    :class:`~passt_tpu.models.passt.PaSSTConfig` (audio-contract metadata).
    Patchout, if configured, is train-only and never enters the exported
    eval graph."""
    from jax import export as jexport

    from passt_tpu.ops.frontend import MelConfig

    # The artifact must deserialize on any JAX runtime: the portable
    # matmul-STFT frontend (one MXU matmul, no custom calls) is the export
    # default — the fused Pallas mel kernel lowers to a Mosaic custom call
    # whose serialization ties the artifact to matching kernel versions,
    # for ~0.2 ms/batch of mel time that serving will not miss.
    mel_cfg = MelConfig(stft_method=mel_method, n_mels=cfg.input_fdim)
    sr = mel_cfg.sr
    n_samples = int(seconds * sr)
    infer = make_inference_fn(model, mel_cfg, seconds, cfg.input_tdim)

    # Bake the weights into the artifact: serving needs one file, not a
    # checkpoint + a framework. jit-with-closure captures them as constants.
    fn = jax.jit(lambda wave: infer(params, wave))

    if batch is None:
        batch = 1
    if isinstance(batch, str):
        (b_dim,) = jexport.symbolic_shape(batch)
    else:
        b_dim = int(batch)
    spec = jax.ShapeDtypeStruct((b_dim, n_samples), jnp.float32)
    exported = jexport.export(fn, platforms=tuple(platforms))(spec)
    blob = exported.serialize()

    artifact = out_path + ARTIFACT_SUFFIX
    manifest = out_path + MANIFEST_SUFFIX
    parent = os.path.dirname(os.path.abspath(artifact))
    os.makedirs(parent, exist_ok=True)
    with open(artifact, "wb") as f:
        f.write(blob)
    with open(manifest, "w") as f:
        json.dump(
            {
                "platforms": list(exported.platforms),
                "sample_rate": sr,
                "seconds": seconds,
                "input": {
                    "shape": [None if isinstance(batch, str) else int(batch), n_samples],
                    "dtype": "float32",
                },
                "outputs": {"logits": cfg.num_classes, "features": cfg.embed_dim},
                "dtype": cfg.dtype,
                "jax_version": jax.__version__,
                "calling_convention_version": exported.calling_convention_version,
                **(manifest_extra or {}),
            },
            f,
            indent=2,
        )
    return artifact, manifest


def load_exported(out_path: str):
    """Deserialize an exported artifact; returns ``fn(wave) -> (logits,
    features)``. Needs only jax — not this package's model code."""
    from jax import export as jexport

    path = out_path if out_path.endswith(ARTIFACT_SUFFIX) else out_path + ARTIFACT_SUFFIX
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def fn(wave):
        return exported.call(jnp.asarray(wave, jnp.float32))

    return fn


def read_manifest(out_path: str) -> dict:
    path = out_path if out_path.endswith(MANIFEST_SUFFIX) else out_path + MANIFEST_SUFFIX
    with open(path) as f:
        return json.load(f)
