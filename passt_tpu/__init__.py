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
