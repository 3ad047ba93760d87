"""passt_tpu — a TPU-native audio-tagging framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of kkoutini/PaSST
("Patchout faSt Spectrogram Transformer", arXiv 2110.05069): raw waveform ->
on-device log-mel frontend with SpecAugment -> a spectrogram transformer with
disentangled time/frequency positional embeddings and patchout -> multilabel /
single-label audio-tagging training (mixup, SWA, warmup+linear-down LR) with
data-parallel (and optional tensor-parallel) execution over a TPU mesh.

Layout
------
- ``passt_tpu.ops``      : mel/STFT frontend ops (XLA + fused Pallas kernels)
- ``passt_tpu.models``   : the PaSST transformer, arch registry, checkpoint port
- ``passt_tpu.train``    : schedules, mixup, SWA, optimizer, train/eval loops
- ``passt_tpu.parallel`` : mesh + sharding rules (dp/tp) over ICI
- ``passt_tpu.data``     : host-side datasets, weighted sampler, prefetch
- ``passt_tpu.experiments`` : the four reference recipes (audioset/esc50/fsd50k/openmic)
"""

__version__ = "0.1.0"

# Convenience top-level surface (submodules import lazily to keep
# `import passt_tpu` light).


def __getattr__(name):
    if name in ("PaSST", "PaSSTConfig", "get_model"):
        from passt_tpu import models

        return getattr(models, name)
    if name == "Predictor":
        from passt_tpu.hear import Predictor

        return Predictor
    if name in ("export_inference", "export_ensemble", "load_exported"):
        from passt_tpu import export

        return getattr(export, name)
    if name in ("MelConfig", "log_mel_spectrogram"):
        from passt_tpu import ops

        return getattr(ops, name)
    raise AttributeError(f"module 'passt_tpu' has no attribute {name!r}")
