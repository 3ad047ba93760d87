"""Export a PaSST inference artifact (StableHLO via jax.export).

One file, weights baked in, symbolic batch, callable from any JAX runtime
without passt_tpu installed — the TPU-native counterpart of shipping a
hear21passt checkpoint (reference README.md:48-65).

    python scripts/export_inference.py --arch passt_s_swa_p16_128_ap476 \
        --checkpoint ported/passt_s_swa_p16_128_ap476.npz \
        --out serving/passt_s --platforms tpu cpu

    # consume (only jax needed):
    from passt_tpu.export import load_exported
    logits, features = load_exported("serving/passt_s")(wave_batch)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", default="passt_s_swa_p16_128_ap476")
    p.add_argument("--ensemble", default=None,
                   help="export a published logit-averaged ensemble (one of passt_tpu.models.registry.ENSEMBLES) instead of --arch")
    p.add_argument("--checkpoint", default=None, help=".npz/.pt ported weights; omit for random init (smoke/debug)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="for --ensemble: directory of <arch>.npz ported member weights")
    p.add_argument("--out", required=True, help="output prefix; writes <out>.passt.hlo + <out>.passt.json")
    p.add_argument("--platforms", nargs="+", default=["tpu"], choices=["tpu", "cpu", "cuda", "rocm"])
    p.add_argument("--seconds", type=float, default=None,
                   help="clip length; default = the arch's trained geometry (input_tdim*hop/sr)")
    p.add_argument("--batch", default="b", help='symbolic dim name (default "b" = any batch) or a fixed positive int')
    p.add_argument("--input-tdim", type=int, default=None,
                   help="override the arch spec's time grid (rarely needed)")
    p.add_argument("--n-classes", type=int, default=None)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--no-bake-weights", action="store_true",
                   help="export fn(params, wave) + <out>.params.npz instead of baking "
                        "weights into the HLO (small artifact; one artifact serves any "
                        "checkpoint of the arch; avoids compile-service size limits)")
    args = p.parse_args(argv)

    from passt_tpu.export import export_inference

    overrides = {}
    if args.n_classes is not None:
        overrides["n_classes"] = args.n_classes
    if args.input_tdim is not None:
        overrides["input_tdim"] = args.input_tdim
    try:
        batch = int(args.batch)
        if batch < 1:
            p.error(f"--batch must be a positive int or a dimension name, got {args.batch!r}")
    except ValueError:
        if not args.batch.isidentifier():
            p.error(f"--batch must be a positive int or a dimension name, got {args.batch!r}")
        batch = args.batch
    if args.ensemble is not None:
        from passt_tpu.export import export_ensemble

        artifact, manifest = export_ensemble(
            args.ensemble,
            args.out,
            checkpoint_dir=args.checkpoint_dir,
            platforms=args.platforms,
            seconds=args.seconds,
            dtype=args.dtype,
            batch=batch,
            **overrides,
        )
    else:
        artifact, manifest = export_inference(
            args.arch,
            args.out,
            checkpoint_path=args.checkpoint,
            platforms=args.platforms,
            seconds=args.seconds,
            dtype=args.dtype,
            batch=batch,
            bake_weights=not args.no_bake_weights,
            **overrides,
        )
    print(f"wrote {artifact} ({os.path.getsize(artifact) / 1e6:.1f} MB) and {manifest}")


if __name__ == "__main__":
    main()
