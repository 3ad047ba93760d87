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
that script for the push-button path); library surface below. The
inference function itself is :func:`passt_tpu.hear.make_inference_fn` —
the same contract the live Predictor serves.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from passt_tpu.ops.frontend import MelConfig

# NOTE: passt_tpu.hear (-> models.passt -> flax) is imported lazily inside
# the export functions: a serving host needs only jax + numpy to call
# load_exported/read_manifest, and flax must not be a deserialization
# dependency (tests/test_export.py::test_load_exported_needs_only_jax).

MANIFEST_SUFFIX = ".passt.json"
ARTIFACT_SUFFIX = ".passt.hlo"
PARAMS_SUFFIX = ".params.npz"


def _derive_seconds(input_tdim: int, mel_cfg) -> float:
    """The arch's natural clip length, rounded UP to the next 0.1 s.

    tdim·hop/sr alone gives 9.98 s for the flagship (its 998-frame grid is
    a *slice* of a 10-second mel — reference ex_audioset input_tdim=998
    with clip_length=10), which would silently shrink the artifact's input
    contract below the conventional clip length; rounding up restores
    10.0 / 20.0 / 30.0 s exactly for every zoo arch, and the frontend's
    ``[:input_tdim]`` frame slice absorbs the extra frames."""
    raw = input_tdim * mel_cfg.hopsize / mel_cfg.sr
    return math.ceil(raw * 10.0 - 1e-9) / 10.0


def _prepare_mel(mel_cfg: Optional[MelConfig], n_mels: int) -> MelConfig:
    """Default + portability-normalize the artifact's frontend config."""
    if mel_cfg is None:
        mel_cfg = MelConfig(n_mels=n_mels, fmin_aug_range=10, fmax_aug_range=2000)
    if mel_cfg.stft_method == "auto":
        # The artifact must deserialize on any JAX runtime: the portable
        # matmul-STFT frontend (one MXU matmul, no custom calls) replaces
        # "auto" — the fused Pallas mel kernel lowers to a Mosaic custom
        # call whose serialization ties the artifact to matching kernel
        # versions, for ~0.2 ms/batch of mel time serving will not miss.
        mel_cfg = dataclasses.replace(mel_cfg, stft_method="matmul")
    return mel_cfg


def _export_and_write(
    fn,
    out_path: str,
    platforms: Sequence[str],
    batch,
    n_samples: int,
    mel_cfg: MelConfig,
    manifest_fields: dict,
    extra_specs: Sequence = (),
) -> Tuple[str, str]:
    """Shared export tail: resolve the batch dim (symbolic name or fixed
    positive int), lower for the platforms, and write artifact + manifest.
    ``extra_specs`` are leading argument specs (e.g. an external-weights
    param tree) placed before the wave spec."""
    from jax import export as jexport

    if batch is None:
        batch = 1
    if isinstance(batch, str):
        (b_dim,) = jexport.symbolic_shape(batch)
    else:
        batch = int(batch)
        if batch < 1:
            raise ValueError(f"fixed batch must be >= 1, got {batch}")
        b_dim = batch
    spec = jax.ShapeDtypeStruct((b_dim, n_samples), jnp.float32)
    exported = jexport.export(fn, platforms=tuple(platforms))(*extra_specs, spec)

    artifact = out_path + ARTIFACT_SUFFIX
    manifest = out_path + MANIFEST_SUFFIX
    os.makedirs(os.path.dirname(os.path.abspath(artifact)), exist_ok=True)
    with open(artifact, "wb") as f:
        f.write(exported.serialize())
    with open(manifest, "w") as f:
        json.dump(
            {
                "platforms": list(exported.platforms),
                "sample_rate": mel_cfg.sr,
                "mel": {
                    "n_mels": mel_cfg.n_mels,
                    "hopsize": mel_cfg.hopsize,
                    "fmin_aug_range": mel_cfg.fmin_aug_range,
                    "fmax_aug_range": mel_cfg.fmax_aug_range,
                },
                "input": {
                    "shape": [None if isinstance(batch, str) else int(batch), n_samples],
                    "dtype": "float32",
                },
                "jax_version": jax.__version__,
                "calling_convention_version": exported.calling_convention_version,
                **manifest_fields,
            },
            f,
            indent=2,
        )
    return artifact, manifest


def export_inference(
    arch: str,
    out_path: str,
    checkpoint_path: Optional[str] = None,
    platforms: Sequence[str] = ("tpu",),
    seconds: Optional[float] = None,
    dtype: str = "float32",
    batch: Optional[str] = "b",
    rng: Optional[jax.Array] = None,
    mel_cfg: Optional[MelConfig] = None,
    bake_weights: bool = True,
    **overrides,
) -> Tuple[str, str]:
    """Export one registry arch (optionally with ported weights) to a
    serialized StableHLO artifact + JSON manifest.

    Arch-aware defaults keep the artifact faithful to the checkpoint:
    ``input_tdim`` comes from the arch spec (so the 20/30-sec and
    stfthop100/160 zoo entries export at their trained geometry, not the
    998-frame default), ``mel_cfg`` from
    :func:`passt_tpu.hear.default_inference_mel_cfg` (recipe aug ranges +
    the arch's STFT hop), and ``seconds`` from input_tdim·hop/sr.
    ``batch="b"`` exports a symbolic batch dimension (one artifact, any
    batch size); pass an int for a fixed-batch artifact.
    Returns (artifact_path, manifest_path)."""
    from passt_tpu.models.passt import init_passt
    from passt_tpu.models.registry import ARCHS, get_model_config

    from passt_tpu.hear import default_inference_mel_cfg  # lazy: flax

    if "input_tdim" not in overrides and arch in ARCHS:
        overrides["input_tdim"] = ARCHS[arch].input_tdim
    # resolve the config ONCE and build from it directly, so the manifest
    # metadata and the exported weights cannot diverge
    cfg = get_model_config(arch, dtype=dtype, **overrides)
    model, params = init_passt(cfg, rng if rng is not None else jax.random.PRNGKey(0))
    if checkpoint_path is not None:
        from passt_tpu.models.pretrained import load_pretrained_params

        params = load_pretrained_params(checkpoint_path, cfg, params)
    if mel_cfg is None:
        mel_cfg = dataclasses.replace(
            default_inference_mel_cfg(arch), n_mels=cfg.input_fdim
        )
    return export_model(
        model,
        params,
        cfg,
        out_path,
        platforms=platforms,
        seconds=seconds,
        batch=batch,
        mel_cfg=mel_cfg,
        bake_weights=bake_weights,
        manifest_extra={"arch": arch, "pretrained": checkpoint_path is not None},
    )


def export_model(
    model,
    params,
    cfg,
    out_path: str,
    platforms: Sequence[str] = ("tpu",),
    seconds: Optional[float] = None,
    batch: Optional[str] = "b",
    mel_cfg: Optional[MelConfig] = None,
    manifest_extra: Optional[dict] = None,
    bake_weights: bool = True,
) -> Tuple[str, str]:
    """Lower + serialize an already-built (model, params). ``cfg`` is its
    :class:`~passt_tpu.models.passt.PaSSTConfig` (audio-contract metadata).
    Patchout, if configured, is train-only and never enters the exported
    eval graph. ``seconds=None`` derives the wave length from the model's
    time grid (input_tdim · hop / sr, rounded up to the conventional clip
    length — see :func:`_derive_seconds`).

    ``bake_weights=True`` (default) freezes the params into the HLO as
    constants: one file, nothing else to load. ``bake_weights=False``
    exports ``fn(params, wave)`` and writes the params to
    ``<out>.params.npz`` instead — the artifact stays a few MB, one
    artifact serves every checkpoint of the arch, and runtimes whose
    compile path bounds module size (e.g. remote-compile services reject
    ~350 MB constant blobs) stay usable. ``load_exported`` handles both
    transparently via the manifest."""
    from passt_tpu.hear import make_inference_fn  # lazy: flax

    mel_cfg = _prepare_mel(mel_cfg, cfg.input_fdim)
    if seconds is None:
        seconds = _derive_seconds(cfg.input_tdim, mel_cfg)
    infer = make_inference_fn(model, mel_cfg, cfg.input_tdim)

    manifest_fields = {
        "seconds": seconds,
        "weights": "baked" if bake_weights else "external",
        "outputs": {"logits": cfg.num_classes, "features": cfg.embed_dim},
        "dtype": cfg.dtype,
        **(manifest_extra or {}),
    }
    if bake_weights:
        # jit-with-closure captures the params as constants in the HLO.
        fn = jax.jit(lambda wave: infer(params, wave))
        extra_specs = ()
    else:
        from passt_tpu.models.pretrained import save_params_npz

        os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
        save_params_npz(out_path + PARAMS_SUFFIX, params)
        fn = jax.jit(infer)
        extra_specs = (jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ),)
    return _export_and_write(
        fn,
        out_path,
        platforms,
        batch,
        int(round(seconds * mel_cfg.sr)),  # round: 32.3*32000 floats to ...99.99
        mel_cfg,
        manifest_fields,
        extra_specs=extra_specs,
    )


def export_ensemble(
    name: str,
    out_path: str,
    checkpoint_dir: Optional[str] = None,
    platforms: Sequence[str] = ("tpu",),
    seconds: Optional[float] = None,
    batch: Optional[str] = "b",
    dtype: str = "float32",
    mel_cfg: Optional[MelConfig] = None,
    rng: Optional[jax.Array] = None,
    **overrides,
) -> Tuple[str, str]:
    """Export a published logit-averaged ensemble as ONE artifact.

    The reference's headline AudioSet numbers are ensembles (0.4956 for
    ensemble_many, README.md:313-326) served by constructing N torch
    models per process; here the whole ensemble — shared mel frontend
    computed once, N transformers, logit mean — lowers into a single
    StableHLO function with all member weights baked in.
    ``name`` indexes :data:`passt_tpu.models.registry.ENSEMBLES`;
    ``checkpoint_dir`` holds ``<arch>.npz`` ported weights (the
    ``evaluate_ensemble`` convention). Returns (artifact, manifest)."""
    from passt_tpu.models.registry import (
        ENSEMBLES,
        ensemble_apply,
        get_ensemble_model,
    )
    from passt_tpu.ops.frontend import log_mel_spectrogram

    if name not in ENSEMBLES:
        raise KeyError(f"unknown ensemble {name!r}; one of {list(ENSEMBLES)}")
    arch_list, published_map = ENSEMBLES[name]
    paths = None
    if checkpoint_dir is not None:
        paths = [
            os.path.join(checkpoint_dir, f"{arch}.npz") for arch, _, _ in arch_list
        ]
    pairs = get_ensemble_model(
        arch_list, rng=rng, checkpoint_paths=paths, dtype=dtype, **overrides
    )
    from passt_tpu.hear import default_inference_mel_cfg  # lazy: flax

    cfg = pairs[0][0].cfg  # members share the input geometry (strides differ)
    if mel_cfg is None:
        mel_cfg = dataclasses.replace(
            default_inference_mel_cfg(arch_list[0][0]), n_mels=cfg.input_fdim
        )
    mel_cfg = _prepare_mel(mel_cfg, cfg.input_fdim)
    if seconds is None:
        seconds = _derive_seconds(cfg.input_tdim, mel_cfg)

    def infer(wave):
        mel = log_mel_spectrogram(wave, mel_cfg, train=False)
        mean, _ = ensemble_apply(pairs, mel[:, None, :, : cfg.input_tdim])
        return mean

    return _export_and_write(
        jax.jit(infer),
        out_path,
        platforms,
        batch,
        int(round(seconds * mel_cfg.sr)),  # round: 32.3*32000 floats to ...99.99
        mel_cfg,
        {
            "seconds": seconds,
            "ensemble": name,
            "members": [list(m) for m in arch_list],
            "published_map": published_map,
            "pretrained": checkpoint_dir is not None,
            "outputs": {"logits": cfg.num_classes},
            "dtype": dtype,
        },
    )


def load_exported(out_path: str):
    """Deserialize an exported artifact; returns ``fn(wave) -> (logits,
    features)``. Needs only jax — not this package's model code. External-
    weights artifacts (manifest ``weights: external``) load their params
    from ``<out>.params.npz`` and pass them as the leading argument."""
    from jax import export as jexport

    base = out_path[: -len(ARTIFACT_SUFFIX)] if out_path.endswith(ARTIFACT_SUFFIX) else out_path
    with open(base + ARTIFACT_SUFFIX, "rb") as f:
        exported = jexport.deserialize(f.read())
    params = None
    if (
        os.path.exists(base + MANIFEST_SUFFIX)
        and read_manifest(base).get("weights") == "external"
    ):
        params = _load_params_npz_plain(base + PARAMS_SUFFIX)

    def fn(wave):
        wave = jnp.asarray(wave, jnp.float32)
        if params is not None:
            return exported.call(params, wave)
        return exported.call(wave)

    return fn


def _load_params_npz_plain(path: str) -> dict:
    """Rebuild the nested param dict from a flat ``a/b/c``-keyed npz —
    duplicated from models.pretrained so that consuming an artifact truly
    needs only this module + jax (no model code imports)."""
    import numpy as np

    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p_ in parts[:-1]:
                node = node.setdefault(p_, {})
            node[parts[-1]] = jnp.asarray(data[key])
    return out


def read_manifest(out_path: str) -> dict:
    """Accepts the prefix, the .passt.hlo path, or the .passt.json path."""
    if out_path.endswith(ARTIFACT_SUFFIX):
        out_path = out_path[: -len(ARTIFACT_SUFFIX)]
    path = out_path if out_path.endswith(MANIFEST_SUFFIX) else out_path + MANIFEST_SUFFIX
    with open(path) as f:
        return json.load(f)
