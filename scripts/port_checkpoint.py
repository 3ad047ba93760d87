#!/usr/bin/env python
"""Port a published PaSST torch checkpoint (.pt) to a passt_tpu .npz tree.

Push-button parity path (PARITY.md runbook): the moment a real checkpoint
and eval HDF5 are available,

    python scripts/port_checkpoint.py passt-s-f128-p16-s10-ap.476-swa.pt \
        ported/passt_s_swa_p16_128_ap476.npz --arch passt_s_swa_p16_128_ap476
    python -m passt_tpu.cli audioset evaluate_only \
        model.arch=passt_s_swa_p16_128_ap476 model.pretrained=true \
        model.checkpoint_path=ported/passt_s_swa_p16_128_ap476.npz \
        data.eval_hdf5=<audioset_eval.h5>

reproduces the published mAP with zero code edits. Conversion handles the
fused qkv split, OIHW->HWIO conv layout, head.0/head.1 naming, dist-token
head and (for ImageNet starts) the bicubic pos-embed adaptation — see
passt_tpu/models/pretrained.py (reference: models/passt.py:656-706,
vit_helpers.py:54-141).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("pt_path", help="torch .pt checkpoint (state dict pickle)")
    p.add_argument("out_npz", help="output .npz parameter tree")
    p.add_argument(
        "--arch",
        default="passt_s_swa_p16_128_ap476",
        help="arch name from passt_tpu.models.registry.ARCHS (sets "
        "depth/width/stride expectations and the nominal input_tdim)",
    )
    p.add_argument("--n-classes", type=int, default=527)
    p.add_argument("--fstride", type=int, default=None)
    p.add_argument("--tstride", type=int, default=None)
    p.add_argument("--input-fdim", type=int, default=128)
    p.add_argument("--input-tdim", type=int, default=None, help="default: the arch's nominal tdim")
    args = p.parse_args(argv)

    import jax

    from passt_tpu.models.passt import init_passt
    from passt_tpu.models.registry import ARCHS, get_model_config
    from passt_tpu.models.pretrained import load_pretrained_params, save_params_npz

    if args.arch not in ARCHS:
        raise SystemExit(f"unknown --arch {args.arch!r}; known: {sorted(ARCHS)}")
    spec = ARCHS[args.arch]
    stride = spec.expected_stride or (10, 10)
    cfg = get_model_config(
        arch=args.arch,
        n_classes=args.n_classes,
        fstride=args.fstride if args.fstride is not None else stride[0],
        tstride=args.tstride if args.tstride is not None else stride[1],
        input_fdim=args.input_fdim,
        input_tdim=args.input_tdim if args.input_tdim is not None else spec.input_tdim,
    )
    _, init_params = init_passt(cfg, jax.random.PRNGKey(0))
    params = load_pretrained_params(args.pt_path, cfg, init_params)
    os.makedirs(os.path.dirname(os.path.abspath(args.out_npz)), exist_ok=True)
    save_params_npz(args.out_npz, params)
    n = sum(p.size for p in jax.tree.leaves(params))
    print(f"ported {args.pt_path} -> {args.out_npz} ({n:,} params, arch {args.arch})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
