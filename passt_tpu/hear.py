"""HEAR-style inference API: waveform in, logits/embeddings out.

The reference ecosystem ships `hear21passt` with this exact surface
(reference README.md:48-65: ``load_model`` then ``model(wave[B, 32000*s])
-> logits``, plus the HEAR-benchmark ``get_scene_embeddings`` /
``get_timestamp_embeddings``). This module is the TPU-native equivalent:
a :class:`Predictor` bundles frontend config + model + params behind one
jitted waveform->output function.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from passt_tpu.models.passt import PaSST, PaSSTConfig, init_passt
from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram


def make_inference_fn(model, mel_cfg: MelConfig, input_tdim: int):
    """waveform [B, T] float32 -> (logits [B, C], features [B, D]):
    eval-mode mel (no SpecAugment / mel-range jitter) + eval-mode forward
    (no patchout) — the single inference contract shared by the Predictor
    and the jax.export serving path (reference hear21passt
    ``model(wave) -> logits``, README.md:48-65)."""

    def infer(params, wave):
        mel = log_mel_spectrogram(wave, mel_cfg, train=False)
        logits, features = model.apply(
            {"params": params}, mel[:, None, :, :input_tdim], train=False
        )
        return logits, features

    return infer


def default_inference_mel_cfg(arch: str) -> MelConfig:
    """The frontend the published checkpoints were trained/evaluated with:
    the AudioSet recipe overrides fmin_aug_range=10, fmax_aug_range=2000
    (reference ex_audioset.py:64-69; the hear21passt package builds its
    AugmentMelSTFT with the same values), and eval-mode fmax is
    sr//2 - fmax_aug_range//2 = 15000 — the plain MelConfig defaults would
    silently shift it to 15500. stfthop archs additionally ran hop 100/160
    (reference passt.py:219-226)."""
    from passt_tpu.models.registry import ARCHS

    hop = ARCHS[arch].hopsize if arch in ARCHS else 320
    return MelConfig(hopsize=hop, fmin_aug_range=10, fmax_aug_range=2000)


@dataclasses.dataclass
class Predictor:
    """Waveform-in inference bundle.

    >>> p = Predictor.create(arch="passt_s_swa_p16_128_ap476",
    ...                      checkpoint_path=".../ported.npz")
    >>> logits = p(wave)              # [B, 527] AudioSet logits
    >>> emb = p.scene_embeddings(wave)  # [B, 1295] logits ‖ features (mode="all")
    >>> emb = p.scene_embeddings(wave, mode="embed_only")  # [B, 768]
    """

    model: PaSST
    params: dict
    mel_cfg: MelConfig
    # hear21passt's ``get_basic_model(mode=...)`` embedding contract
    # (reference README.md:48-65 ecosystem): "all" = logits ‖ features
    # (1295-d for the 527-class flagship — the HEAR-benchmark submission's
    # scene embedding), "logits" = classifier logits only, "embed_only" =
    # the 768-d averaged CLS/DIST features.
    mode: str = "all"
    _apply: Optional[callable] = None

    @classmethod
    def create(
        cls,
        arch: str = "passt_s_swa_p16_128_ap476",
        checkpoint_path: Optional[str] = None,
        mel_cfg: Optional[MelConfig] = None,
        dtype: str = "bfloat16",
        mode: str = "all",
        **overrides,
    ) -> "Predictor":
        from passt_tpu.models.registry import ARCHS, get_model

        if mel_cfg is None:
            mel_cfg = default_inference_mel_cfg(arch)
        if arch in ARCHS:
            # trained time-grid geometry (20/30-sec and stfthop archs are
            # NOT 998 frames — building them at the default would silently
            # crop to a prefix of the clip; export.py applies the same)
            overrides.setdefault("input_tdim", ARCHS[arch].input_tdim)

        model, params = get_model(
            arch=arch,
            pretrained=checkpoint_path is not None,
            checkpoint_path=checkpoint_path,
            dtype=dtype,
            **overrides,
        )
        return cls(model=model, params=params, mel_cfg=mel_cfg, mode=mode)

    def _fn(self):
        if self._apply is None:
            apply = jax.jit(
                make_inference_fn(self.model, self.mel_cfg, self.model.cfg.input_tdim)
            )
            object.__setattr__(self, "_apply", apply)
        return self._apply

    def __call__(self, wave) -> jnp.ndarray:
        """[B, T] float32 waveform at 32 kHz -> [B, num_classes] logits."""
        logits, _ = self._fn()(self.params, jnp.asarray(wave))
        return logits

    def logits_and_features(self, wave) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._fn()(self.params, jnp.asarray(wave))

    # ---- HEAR benchmark surface -----------------------------------------
    def _embed(self, logits, feats, mode: Optional[str]) -> jnp.ndarray:
        mode = mode or self.mode
        if mode == "all":
            return jnp.concatenate([logits, feats], axis=-1)
        if mode == "logits":
            return logits
        if mode == "embed_only":
            return feats
        raise ValueError(
            f"unknown embedding mode {mode!r}; known: all / logits / embed_only"
        )

    def scene_embeddings(self, wave, mode: Optional[str] = None) -> jnp.ndarray:
        """[B, T] -> [B, D] clip-level embedding (hear21passt
        get_scene_embeddings). D depends on ``mode`` (default: the
        Predictor's): "all" = n_classes + 768 (the reference ecosystem's
        1295-d logits ‖ features contract), "logits" = n_classes,
        "embed_only" = 768 averaged CLS/DIST features."""
        logits, feats = self._fn()(self.params, jnp.asarray(wave))
        return self._embed(logits, feats, mode)

    #: window rows per jitted forward in timestamp_embeddings: bounds
    #: device memory on minutes-long HEAR clips (10 min at hop 50 ms is
    #: 12k windows) and — because the tail chunk is PADDED up to this
    #: size — gives exactly ONE compiled shape for every clip length.
    timestamp_chunk: int = 256

    def timestamp_embeddings(
        self, wave, window_seconds: float = 0.16, hop_seconds: float = 0.05,
        mode: Optional[str] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[B, T] -> ([B, N, D] embeddings, [B, N] timestamps in ms):
        sliding-window scene embeddings (hear21passt
        get_timestamp_embeddings semantics: the audio is zero-padded by
        half a window on both sides so the timestamp grid spans the whole
        clip — including arbitrarily short clips, which the HEAR contract
        requires the entry point to accept). Timestamps follow the HEAR
        API shape contract — (n_sounds, n_timestamps), the grid repeated
        per sound exactly as hear21passt returns it."""
        wave = jnp.asarray(wave)
        sr = self.mel_cfg.sr
        win = int(window_seconds * sr)
        hop = int(hop_seconds * sr)
        b, t = wave.shape
        # pad half a window each side: window n is centered on sample n*hop
        # of the ORIGINAL audio, and even t < win yields >= 1 window
        padded = jnp.pad(wave, ((0, 0), (win // 2, win - win // 2)))
        centers = np.arange(win // 2, win // 2 + t, hop)  # in padded coords
        windows = [padded[:, c - win // 2 : c - win // 2 + win] for c in centers]
        stacked = np.asarray(jnp.stack(windows, axis=1).reshape(b * len(centers), win))
        # fixed-size chunks (tail padded): one compiled shape, bounded HBM
        chunk = self.timestamp_chunk
        outs = []
        fn = self._fn()
        for lo in range(0, len(stacked), chunk):
            part = stacked[lo : lo + chunk]
            n_real = len(part)
            if n_real < chunk:
                part = np.pad(part, ((0, chunk - n_real), (0, 0)))
            logits, feats = fn(self.params, jnp.asarray(part))
            outs.append(np.asarray(self._embed(logits, feats, mode))[:n_real])
        feats = jnp.asarray(np.concatenate(outs)).reshape(b, len(centers), -1)
        grid = (centers - win // 2) / sr * 1000.0
        timestamps = jnp.asarray(np.broadcast_to(grid, (b, len(centers))).copy())
        return feats, timestamps


# ---------------------------------------------------------------------------
# hear21passt drop-in module surface (the HEAR benchmark entry points:
# ``load_model`` / ``get_scene_embeddings`` / ``get_timestamp_embeddings``;
# reference README.md:48-65 and the hear-eval-kit API contract).
# ---------------------------------------------------------------------------
def load_model(model_file_path: Optional[str] = None, **kwargs) -> Predictor:
    """HEAR entry point: build the inference model. ``model_file_path`` is
    a locally ported checkpoint (.npz / .pt); None = random init."""
    return Predictor.create(checkpoint_path=model_file_path or None, **kwargs)


def get_scene_embeddings(audio, model: Predictor) -> jnp.ndarray:
    """HEAR entry point: [B, T] audio -> [B, D] clip embeddings."""
    return model.scene_embeddings(audio)


def get_timestamp_embeddings(audio, model: Predictor):
    """HEAR entry point: [B, T] audio -> ([B, N, D], [N] ms timestamps)."""
    return model.timestamp_embeddings(audio)
