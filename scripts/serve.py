"""Batch-serve an exported artifact over a directory of .wav files.

The operational end of the serving story: consume a `jax.export` artifact
produced by `scripts/export_inference.py` with nothing but jax + numpy on
the serving host — no torch, no checkpoints, no model code (the artifact
loader and the WAV reader below are the only passt_tpu touchpoints, both
dependency-free). Clips are padded/truncated to the artifact's clip
length and batched; outputs land in one .npz.

    python scripts/serve.py --artifact serving/passt_s \
        --wav-dir /data/clips --out predictions.npz [--batch 8] [--probs]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True, help="path prefix of <x>.passt.hlo")
    p.add_argument("--wav-dir", required=True)
    p.add_argument("--out", default="predictions.npz")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--probs", action="store_true", help="store sigmoid probabilities instead of logits")
    args = p.parse_args(argv)

    from passt_tpu.data.datasets import decode_wav, pad_or_truncate
    from passt_tpu.export import load_exported, read_manifest

    manifest = read_manifest(args.artifact)
    n_samples = manifest["input"]["shape"][1]
    rate = manifest["sample_rate"]
    fixed_batch = manifest["input"]["shape"][0]  # None = symbolic
    if fixed_batch is not None and fixed_batch != args.batch:
        print(f"artifact has fixed batch {fixed_batch}; using it")
        args.batch = fixed_batch
    fn = load_exported(args.artifact)

    files = sorted(glob.glob(os.path.join(args.wav_dir, "**", "*.wav"), recursive=True))
    if not files:
        raise SystemExit(f"no .wav files under {args.wav_dir}")
    names, outs = [], []
    for start in range(0, len(files), args.batch):
        chunk = files[start : start + args.batch]
        waves = []
        for path in chunk:
            with open(path, "rb") as f:
                w = decode_wav(np.frombuffer(f.read(), np.uint8), target_rate=rate)
            waves.append(pad_or_truncate(w, n_samples))
        batch = np.stack(waves)
        if fixed_batch is not None and len(batch) < fixed_batch:
            batch = np.concatenate(
                [batch, np.zeros((fixed_batch - len(batch), n_samples), np.float32)]
            )
        res = fn(batch)
        logits = np.asarray(res[0] if isinstance(res, (tuple, list)) else res)
        logits = logits[: len(chunk)]
        if args.probs:
            logits = 1.0 / (1.0 + np.exp(-logits))
        # relpath (not basename): recursive globs can hold same-named
        # files in different subdirectories and predictions must stay
        # attributable
        names.extend(os.path.relpath(c, args.wav_dir) for c in chunk)
        outs.append(logits)
        print(f"{min(start + args.batch, len(files))}/{len(files)}", flush=True)

    np.savez(args.out, names=np.asarray(names), out=np.concatenate(outs))
    print(f"wrote {args.out}: {len(names)} clips x {outs[0].shape[1]} outputs")


if __name__ == "__main__":
    main()
