"""Architecture registry and pretrained zoo metadata.

Mirrors the reference's arch surface: ``default_cfgs`` checkpoint zoo
(reference: models/passt.py:53-243), the per-arch builder functions
(passt.py:756-912), ``get_model`` (passt.py:957-1018), ``lighten_model``
(passt.py:932-954) and ``get_ensemble_model`` (passt.py:1039-1045) — as data
plus pure functions instead of module-mutating builders.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from passt_tpu.models.passt import PaSST, PaSSTConfig, init_passt

_PASST_RELEASES = "https://github.com/kkoutini/PaSST/releases/download"


def _zoo(url, num_classes=527, input_size=(1, 128, 998), classifier=("head.1", "head_dist")):
    return {
        "url": url,
        "num_classes": num_classes,
        "input_size": input_size,
        "classifier": classifier,
    }


#: Pretrained checkpoint zoo (URLs and metadata exactly as published by the
#: reference, models/passt.py:175-242; ImageNet/DeiT start points included
#: for the from-ImageNet training path).
DEFAULT_CFGS: Dict[str, dict] = {
    "passt_s_swa_p16_128_ap476": _zoo(f"{_PASST_RELEASES}/v0.0.1-audioset/passt-s-f128-p16-s10-ap.476-swa.pt"),
    "passt_s_kd_p16_128_ap486": _zoo(f"{_PASST_RELEASES}/v.0.0.9/passt-s-kd-ap.486.pt"),
    "passt_l_kd_p16_128_ap47": _zoo(f"{_PASST_RELEASES}/v.0.0.10/passt-l-kd-ap.47.pt"),
    "passt_s_swa_p16_128_ap4761": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s10-ap.4761-swa.pt"),
    "passt_s_p16_128_ap472": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s10-ap.472.pt"),
    "passt_s_p16_s16_128_ap468": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s16-ap.468.pt"),
    "passt_s_swa_p16_s16_128_ap473": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s16-ap.473-swa.pt"),
    "passt_s_swa_p16_s14_128_ap471": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s14-ap.471-swa.pt"),
    "passt_s_p16_s14_128_ap469": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s14-ap.469.pt"),
    "passt_s_swa_p16_s12_128_ap473": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s12-ap.473-swa.pt"),
    "passt_s_p16_s12_128_ap470": _zoo(f"{_PASST_RELEASES}/v0.0.2-audioset/passt-s-f128-p16-s12-ap.470.pt"),
    "passt_s_swa_f128_stfthop100_p16_s10_ap473": _zoo(
        f"{_PASST_RELEASES}/v0.0.3-audioset/passt-s-f128-stfthop100-p16-s10-ap.473-swa.pt",
        input_size=(1, 128, 3200),
    ),
    "passt_s_swa_f128_stfthop160_p16_s10_ap473": _zoo(
        f"{_PASST_RELEASES}/v0.0.3-audioset/passt-s-f128-stfthop160-p16-s10-ap.473-swa.pt",
        input_size=(1, 128, 2000),
    ),
    "passt-s-f128-20sec-p16-s10-ap474-swa": _zoo(
        f"{_PASST_RELEASES}/v0.0.5/passt-s-f128-20sec-p16-s10-ap.474-swa.pt", input_size=(1, 128, 2000)
    ),
    "passt-s-f128-30sec-p16-s10-ap473-swa": _zoo(
        f"{_PASST_RELEASES}/v0.0.5/passt-s-f128-30sec-p16-s10-ap.473-swa.pt", input_size=(1, 128, 3000)
    ),
    "openmic2008_passt_u_f128_p16_s10_ap85_swa": _zoo(
        f"{_PASST_RELEASES}/v0.0.4-openmic/openmic2008.passt-u-f128-p16-s10-ap.85-swa.pt",
        num_classes=20, input_size=(1, 128, 3200),
    ),
    "openmic2008_passt_u_f128_p16_s10_ap85": _zoo(
        f"{_PASST_RELEASES}/v0.0.4-openmic/openmic2008.passt-u-f128-p16-s10-ap.85.pt",
        num_classes=20, input_size=(1, 128, 2000),
    ),
    "deit_base_distilled_patch16_384": {
        "url": "https://dl.fbaipublicfiles.com/deit/deit_base_distilled_patch16_384-d0272ac0.pth",
        "num_classes": 1000,
        "input_size": (3, 384, 384),
        "classifier": ("head", "head_dist"),
    },
}


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    """Static architecture description behind an arch name."""

    depth: int = 12
    embed_dim: int = 768
    num_heads: int = 12
    distilled: bool = True
    expected_stride: Optional[Tuple[int, int]] = (10, 10)
    pretrained_name: Optional[str] = None  # key into DEFAULT_CFGS
    input_tdim: int = 998  # nominal time grid the checkpoint was trained with
    hopsize: int = 320  # STFT hop the checkpoint's frontend used (the
    # stfthop100/160 zoo entries were trained on higher temporal
    # resolution, reference passt.py:219-226)


#: Arch name -> spec; the same surface as the reference builder functions
#: (passt.py:745-912) and the get_model dispatch table (passt.py:981-1008).
ARCHS: Dict[str, ArchSpec] = {
    "passt_deit_bd_p16_384": ArchSpec(expected_stride=None, pretrained_name="deit_base_distilled_patch16_384"),
    "passt_s_kd_p16_128_ap486": ArchSpec(pretrained_name="passt_s_kd_p16_128_ap486"),
    "passt_l_kd_p16_128_ap47": ArchSpec(depth=7, pretrained_name="passt_l_kd_p16_128_ap47"),
    "passt_s_swa_p16_128_ap476": ArchSpec(pretrained_name="passt_s_swa_p16_128_ap476"),
    "passt_s_swa_p16_128_ap4761": ArchSpec(pretrained_name="passt_s_swa_p16_128_ap4761"),
    "passt_s_p16_128_ap472": ArchSpec(pretrained_name="passt_s_p16_128_ap472"),
    "passt_s_p16_s16_128_ap468": ArchSpec(expected_stride=(16, 16), pretrained_name="passt_s_p16_s16_128_ap468"),
    "passt_s_swa_p16_s16_128_ap473": ArchSpec(expected_stride=(16, 16), pretrained_name="passt_s_swa_p16_s16_128_ap473"),
    "passt_s_swa_p16_s14_128_ap471": ArchSpec(expected_stride=(14, 14), pretrained_name="passt_s_swa_p16_s14_128_ap471"),
    "passt_s_p16_s14_128_ap469": ArchSpec(expected_stride=(14, 14), pretrained_name="passt_s_p16_s14_128_ap469"),
    "passt_s_swa_p16_s12_128_ap473": ArchSpec(expected_stride=(12, 12), pretrained_name="passt_s_swa_p16_s12_128_ap473"),
    "passt_s_p16_s12_128_ap470": ArchSpec(expected_stride=(12, 12), pretrained_name="passt_s_p16_s12_128_ap470"),
    "passt_s_f128_20sec_p16_s10_ap474": ArchSpec(pretrained_name="passt-s-f128-20sec-p16-s10-ap474-swa", input_tdim=2000),
    "passt_s_f128_30sec_p16_s10_ap473": ArchSpec(pretrained_name="passt-s-f128-30sec-p16-s10-ap473-swa", input_tdim=3000),
    # high-temporal-resolution STFT checkpoints (reference passt.py:219-226:
    # hop 100 -> 10 s = 3200 frames, hop 160 -> 2000 frames)
    "passt_s_swa_f128_stfthop100_p16_s10_ap473": ArchSpec(
        pretrained_name="passt_s_swa_f128_stfthop100_p16_s10_ap473", input_tdim=3200, hopsize=100
    ),
    "passt_s_swa_f128_stfthop160_p16_s10_ap473": ArchSpec(
        pretrained_name="passt_s_swa_f128_stfthop160_p16_s10_ap473", input_tdim=2000, hopsize=160
    ),
}


def get_model_config(
    arch: str = "passt_s_kd_p16_128_ap486",
    n_classes: int = 527,
    in_channels: int = 1,
    fstride: int = 10,
    tstride: int = 10,
    input_fdim: int = 128,
    input_tdim: int = 998,
    u_patchout: int = 0,
    s_patchout_t: int = 0,
    s_patchout_f: int = 0,
    dtype: str = "float32",
    gelu: str = "auto",
    plus1_attn: bool = False,
    attn_impl: str = "auto",
    ln_impl: str = "auto",
    patch_embed_impl: str = "unfold",
    blocks_impl: str = "loop",
    fuse_ln_qkv: bool = False,
) -> PaSSTConfig:
    """Resolve an arch name + overrides to a :class:`PaSSTConfig`
    (the reference ``get_model`` signature, passt.py:957-961)."""
    if arch not in ARCHS:
        raise RuntimeError(f"Unknown model {arch}")
    spec = ARCHS[arch]
    if spec.expected_stride is not None and (fstride, tstride) != spec.expected_stride:
        warnings.warn(
            f"{arch} was pre-trained with strides {spec.expected_stride}, "
            f"but (fstride, tstride) is {(fstride, tstride)}."
        )
    return PaSSTConfig(
        input_fdim=input_fdim,
        input_tdim=input_tdim,
        stride=(fstride, tstride),
        in_chans=in_channels,
        num_classes=n_classes,
        embed_dim=spec.embed_dim,
        depth=spec.depth,
        num_heads=spec.num_heads,
        distilled=spec.distilled,
        u_patchout=u_patchout,
        s_patchout_t=s_patchout_t,
        s_patchout_f=s_patchout_f,
        dtype=dtype,
        gelu=gelu,
        plus1_attn=plus1_attn,
        attn_impl=attn_impl,
        ln_impl=ln_impl,
        patch_embed_impl=patch_embed_impl,
        blocks_impl=blocks_impl,
        fuse_ln_qkv=fuse_ln_qkv,
    )


def get_model(
    arch: str = "passt_s_kd_p16_128_ap486",
    pretrained: bool = True,
    rng: Optional[jax.Array] = None,
    checkpoint_path: Optional[str] = None,
    **overrides,
):
    """Build (model, params) for an arch, optionally loading a ported
    checkpoint (the reference get_model, passt.py:957-1018).

    ``pretrained=True`` requires ``checkpoint_path`` pointing at either a
    torch ``.pt`` state dict (converted on the fly) or a previously saved
    converted ``.npz`` tree (scripts/port_checkpoint.py) or the original
    torch ``.pt``; this framework does not download. (Orbax TRAINING
    checkpoints are restored through the training loop's
    restore_checkpoint, not through this inference-weights path.)"""
    cfg = get_model_config(arch, **overrides)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model, params = init_passt(cfg, rng)
    if pretrained:
        from passt_tpu.models.pretrained import load_pretrained_params

        if checkpoint_path is None:
            spec = ARCHS[arch]
            url = DEFAULT_CFGS.get(spec.pretrained_name, {}).get("url", "?")
            raise FileNotFoundError(
                f"pretrained weights for {arch} must be provided via "
                f"checkpoint_path (download {url} on a machine with network "
                "access and port it with passt_tpu.models.pretrained)."
            )
        params = load_pretrained_params(checkpoint_path, cfg, params)
    return model, params


def fix_embedding_layer(model, params, embed: str = "default"):
    """Patch-embedding surgery (reference passt.py:922-930). Only
    ``embed="default"`` is functional in the reference too: the "overlap" /
    "am_keepconv" branches reference classes (`PatchEmbedAdaptiveMean*`)
    that are defined nowhere in its repo and raise NameError — treated here
    as explicitly not implemented."""
    if embed == "default":
        return model, params
    raise NotImplementedError(
        f"embed={embed!r}: the reference's adaptive-mean patch embeds are "
        "undefined in its codebase (passt.py:922-930 NameError); not ported"
    )


def lighten_params(params: dict, cut_depth: int) -> Tuple[dict, int]:
    """Remove transformer blocks from a param tree — the reference
    ``lighten_model`` (passt.py:932-954). Positive ``cut_depth`` keeps block 0
    plus blocks[cut_depth+1:]; negative keeps every ``-cut_depth``-th interior
    block plus the first and last. Returns (new_params, new_depth)."""
    if cut_depth == 0:
        return params, len([k for k in params if k.startswith("blocks_")])
    block_ids = sorted(
        int(k.split("_")[1]) for k in params if k.startswith("blocks_")
    )
    if cut_depth < 0:
        keep = [block_ids[0]] + block_ids[1:-1][::-cut_depth] + [block_ids[-1]]
    else:
        if len(block_ids) < cut_depth + 2:
            raise ValueError(
                f"cut_depth for a ViT with {len(block_ids)} layers must be "
                f"between 1 and {len(block_ids) - 2}"
            )
        keep = [block_ids[0]] + block_ids[cut_depth + 1 :]
    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    for new_i, old_i in enumerate(keep):
        out[f"blocks_{new_i}"] = params[f"blocks_{old_i}"]
    return out, len(keep)


#: Published ensemble recipes: name -> ([(arch, fstride, tstride), ...], mAP)
#: (reference config_updates.py:136-222; README.md:313-326).
ENSEMBLES: Dict[str, Tuple[List[Tuple[str, int, int]], float]] = {
    "ensemble_s10": (
        [
            ("passt_s_swa_p16_128_ap476", 10, 10),
            ("passt_s_swa_p16_128_ap4761", 10, 10),
            ("passt_s_p16_128_ap472", 10, 10),
        ],
        0.4864,
    ),
    "ensemble_many": (
        [
            ("passt_s_swa_p16_128_ap476", 10, 10),
            ("passt_s_swa_p16_128_ap4761", 10, 10),
            ("passt_s_p16_128_ap472", 10, 10),
            ("passt_s_p16_s12_128_ap470", 12, 12),
            ("passt_s_swa_p16_s12_128_ap473", 12, 12),
            ("passt_s_p16_s14_128_ap469", 14, 14),
            ("passt_s_swa_p16_s14_128_ap471", 14, 14),
            ("passt_s_swa_p16_s16_128_ap473", 16, 16),
            ("passt_s_p16_s16_128_ap468", 16, 16),
        ],
        0.4956,
    ),
    "ensemble_4": (
        [
            ("passt_s_swa_p16_128_ap476", 10, 10),
            ("passt_s_swa_p16_s12_128_ap473", 12, 12),
            ("passt_s_swa_p16_s14_128_ap471", 14, 14),
            ("passt_s_swa_p16_s16_128_ap473", 16, 16),
        ],
        0.4926,
    ),
    "ensemble_5": (
        [
            ("passt_s_swa_p16_128_ap476", 10, 10),
            ("passt_s_swa_p16_128_ap4761", 10, 10),
            ("passt_s_swa_p16_s12_128_ap473", 12, 12),
            ("passt_s_swa_p16_s14_128_ap471", 14, 14),
            ("passt_s_swa_p16_s16_128_ap473", 16, 16),
        ],
        0.49459,
    ),
    "ensemble_s16_14": (
        [
            ("passt_s_swa_p16_s14_128_ap471", 14, 14),
            ("passt_s_swa_p16_s16_128_ap473", 16, 16),
        ],
        0.48579,
    ),
}


def get_ensemble_model(
    arch_list: Sequence[Tuple[str, int, int]],
    rng: Optional[jax.Array] = None,
    checkpoint_paths: Optional[Sequence[Optional[str]]] = None,
    **overrides,
):
    """Build [(model, params), ...] for an ensemble spec — the reference
    ``get_ensemble_model`` (passt.py:1039-1045). Apply with
    :func:`ensemble_apply`."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    out = []
    for i, (arch, fstride, tstride) in enumerate(arch_list):
        path = checkpoint_paths[i] if checkpoint_paths else None
        out.append(
            get_model(
                arch=arch,
                pretrained=path is not None,
                checkpoint_path=path,
                rng=jax.random.fold_in(rng, i),
                fstride=fstride,
                tstride=tstride,
                **overrides,
            )
        )
    return out


def ensemble_apply(models_and_params: Sequence[Tuple[PaSST, dict]], x: jnp.ndarray):
    """Average the logits of independently constructed models — the reference
    ``EnsembelerModel`` (passt.py:1021-1036): returns (mean_logits,
    mean_logits), matching its (out, out) convention."""
    total = None
    for model, params in models_and_params:
        out, _ = model.apply({"params": params}, x, train=False)
        total = out if total is None else total + out
    mean = total / len(models_and_params)
    return mean, mean
