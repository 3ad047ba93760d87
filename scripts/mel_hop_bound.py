"""Measured bound for the hop-100/160 mel presets' XLA fallback (round-2
verdict next #6 alternative): the fused Pallas mel kernel requires
lane-conforming hops (hop % 128 in {0, 64} with 2*hop lane-aligned —
ops/pallas/mel_kernel.py), so the published hop-100/160 checkpoint
families (reference models/passt.py:219-226) take the XLA matmul-STFT
path. This measures what that fallback actually costs per train step's
worth of mel work, so PARITY.md can carry a number instead of a shrug.

Run on the real chip: python scripts/mel_hop_bound.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from scripts.profile_step import timed
from passt_tpu.ops.frontend import MelConfig, log_mel_spectrogram
from passt_tpu.ops.pallas.mel_kernel import kernel_supports

B = 12


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((B, 320000)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    for hop in (320, 160, 100):
        sup = kernel_supports(hop, 1024)
        rows = {}
        for method in ("matmul", "pallas") if sup else ("matmul",):
            cfg = MelConfig(
                hopsize=hop, stft_method=method,
                fmin_aug_range=10, fmax_aug_range=2000,
            )

            def mel_train(w):
                return log_mel_spectrogram(w, cfg, train=True, rng=key)

            rows[method] = timed(mel_train, wave, steps=50) * 1e3
        line = f"hop {hop}: xla {rows['matmul']:.2f} ms"
        if "pallas" in rows:
            line += f", pallas {rows['pallas']:.2f} ms (kernel supported)"
        else:
            line += " (kernel unsupported -> XLA fallback)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
