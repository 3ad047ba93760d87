"""Checkpoint porting: torch PaSST / ViT / DeiT state dicts -> flax params.

Covers the reference's checkpoint-adaptation machinery
(reference: models/passt.py:246-268, 633-706; models/helpers/vit_helpers.py:54-141):

- layout conversion (torch OIHW conv -> HWIO, Linear (out,in) -> (in,out),
  LayerNorm weight -> scale, the reference's fused qkv and ``head.0/head.1``
  Sequential naming),
- **ImageNet -> PaSST positional-embedding adaptation**: checkpoints without
  ``time_new_pos_embed`` are ImageNet ViTs; their square 2-D grid embedding is
  bicubic-resized to (F_grid, T_grid) and mean-reduced over time to get the
  frequency embedding and over frequency to get the time embedding
  (passt.py:656-706),
- input-conv channel adaptation: RGB patch conv summed to 1 channel
  (passt.py:246-268),
- classifier dropping when ``num_classes`` differs (vit_helpers.py:120-130).

The build/serving environment has no network access: checkpoints are ported
from local ``.pt`` files (torch pickle) or from ``.npz`` files previously
saved with :func:`save_params_npz`.
"""

from __future__ import annotations

import warnings
from typing import Dict, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from passt_tpu.models.passt import PaSSTConfig


def _t(x) -> np.ndarray:
    """torch tensor / array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def adapt_input_conv(in_chans: int, conv_hwio: np.ndarray) -> np.ndarray:
    """Adapt an HWIO patch-conv kernel to ``in_chans`` input channels
    (reference passt.py:246-268, for the mono-audio in_chans=1 case)."""
    kh, kw, i, o = conv_hwio.shape
    if i == in_chans:
        return conv_hwio
    if in_chans == 1:
        if i > 3:
            assert i % 3 == 0
            return conv_hwio.reshape(kh, kw, i // 3, 3, o).sum(axis=3)
        return conv_hwio.sum(axis=2, keepdims=True)
    if i != 3:
        raise NotImplementedError("weight format not supported for channel adaptation")
    repeat = -(-in_chans // 3)
    out = np.tile(conv_hwio, (1, 1, repeat, 1))[:, :, :in_chans, :]
    return out * (3.0 / float(in_chans))


def _cubic_weights(frac: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic-convolution weights for the 4 taps around a sample point, with
    PyTorch's kernel parameter a=-0.75 (W(x) per Keys 1981)."""
    x = frac[:, None] + np.array([1.0, 0.0, -1.0, -2.0])[None, :]
    ax = np.abs(x)
    w_near = (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
    w_far = a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
    return np.where(ax <= 1.0, w_near, np.where(ax < 2.0, w_far, 0.0))


def _bicubic_resize_axis(x: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """1-D cubic resize along ``axis``, matching
    ``torch.nn.functional.interpolate(mode='bicubic', align_corners=False)``
    (half-pixel centers, border replication)."""
    in_size = x.shape[axis]
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    weights = _cubic_weights(frac)  # (out, 4)
    taps = np.clip(i0[:, None] + np.array([-1, 0, 1, 2])[None, :], 0, in_size - 1)
    moved = np.moveaxis(x, axis, 0)  # (in, ...)
    gathered = moved[taps]  # (out, 4, ...)
    out = np.einsum("ot,ot...->o...", weights, gathered)
    return np.moveaxis(out, 0, axis)


def bicubic_resize_2d(grid: np.ndarray, out_hw) -> np.ndarray:
    """[H, W, D] -> [H', W', D], torch-bicubic-exact (separable)."""
    out = _bicubic_resize_axis(grid.astype(np.float64), out_hw[0], axis=0)
    out = _bicubic_resize_axis(out, out_hw[1], axis=1)
    return out


def adapt_image_pos_embed(
    pos_embed: np.ndarray, num_tokens: int, grid_size
) -> Dict[str, np.ndarray]:
    """ImageNet 1-D pos embed -> PaSST's disentangled embeddings
    (reference ``adapt_image_pos_embed_to_passt``, passt.py:656-676):
    bicubic-resize the square grid to (F_grid, T_grid), then mean over time
    gives the frequency embedding and mean over frequency the time embedding.

    Returns arrays in this framework's NHWC-oriented layout:
    ``new_pos_embed (1, num_tokens, D)``, ``freq_new_pos_embed (1, F, 1, D)``,
    ``time_new_pos_embed (1, 1, T, D)``.
    """
    f_grid, t_grid = grid_size
    pos_embed = _t(pos_embed)
    tok = pos_embed[:, :num_tokens]
    grid = pos_embed[0, num_tokens:]
    gs_old = int(np.sqrt(len(grid)))
    d = grid.shape[-1]
    grid = grid.reshape(gs_old, gs_old, d)
    resized = bicubic_resize_2d(grid, (f_grid, t_grid))[None]  # (1, F, T, D)
    freq = resized.mean(axis=2, keepdims=True)  # (1, F, 1, D)
    time = resized.mean(axis=1, keepdims=True)  # (1, 1, T, D)
    return {
        "new_pos_embed": tok.astype(np.float32),
        "freq_new_pos_embed": freq.astype(np.float32),
        "time_new_pos_embed": time.astype(np.float32),
    }


def convert_torch_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    cfg: PaSSTConfig,
    init_params: Optional[dict] = None,
    strict: bool = True,
) -> dict:
    """Convert a (reference-layout) torch state dict to this framework's
    flax param tree. ``init_params`` supplies values for anything the
    checkpoint legitimately lacks (e.g. a dropped classifier head)."""
    if "model" in state_dict and not hasattr(state_dict["model"], "shape"):
        state_dict = state_dict["model"]  # deit wrapper (unwrap before _t)
    sd = {k: _t(v) for k, v in state_dict.items()}

    d = cfg.embed_dim
    f_grid, t_grid = cfg.grid_size
    params: dict = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    # --- positional embeddings ------------------------------------------
    if "time_new_pos_embed" not in sd:
        # ImageNet checkpoint: adapt the square grid (passt.py:686-694).
        adapted = adapt_image_pos_embed(take("pos_embed"), cfg.num_tokens, (f_grid, t_grid))
        params.update({k: jnp.asarray(v) for k, v in adapted.items()})
    else:
        # torch layouts: (1, D, F, 1) and (1, D, 1, T) -> NHWC-ish.
        freq = take("freq_new_pos_embed").transpose(0, 2, 3, 1)
        time = take("time_new_pos_embed").transpose(0, 2, 3, 1)
        if freq.shape != (1, f_grid, 1, d):
            raise ValueError(f"freq pos embed {freq.shape} != model grid {(1, f_grid, 1, d)}")
        if time.shape[2] < t_grid:
            raise ValueError(
                f"checkpoint time pos embed covers {time.shape[2]} patches "
                f"< model grid {t_grid}; pick a longer-t checkpoint or reduce input_tdim"
            )
        if time.shape[2] > t_grid:
            warnings.warn(
                f"cropping checkpoint time pos embed {time.shape[2]} -> {t_grid}"
            )
            time = time[:, :, :t_grid, :]
        params["freq_new_pos_embed"] = jnp.asarray(freq)
        params["time_new_pos_embed"] = jnp.asarray(time)
        params["new_pos_embed"] = jnp.asarray(take("new_pos_embed"))

    params["cls_token"] = jnp.asarray(take("cls_token"))
    if cfg.distilled and "dist_token" in sd:
        params["dist_token"] = jnp.asarray(take("dist_token"))
    elif "dist_token" in sd:
        consumed.add("dist_token")
    # (distilled cfg + checkpoint without dist_token: filled from
    # init_params below, mirroring the reference's non-strict load)

    # --- patch embedding --------------------------------------------------
    w = take("patch_embed.proj.weight")
    if w.ndim < 4:  # pre-conv patchify checkpoints (passt.py:697-700)
        w = w.reshape(d, -1, *cfg.patch_size)
    w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    w = adapt_input_conv(cfg.in_chans, w)
    params["patch_embed"] = {
        "proj": {"kernel": jnp.asarray(w), "bias": jnp.asarray(take("patch_embed.proj.bias"))}
    }

    # --- transformer blocks ------------------------------------------------
    def dense(prefix):
        return {
            "kernel": jnp.asarray(take(prefix + ".weight").T),
            "bias": jnp.asarray(take(prefix + ".bias")),
        }

    def norm(prefix):
        return {
            "scale": jnp.asarray(take(prefix + ".weight")),
            "bias": jnp.asarray(take(prefix + ".bias")),
        }

    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    if n_blocks != cfg.depth:
        raise ValueError(f"checkpoint has {n_blocks} blocks, model depth is {cfg.depth}")
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": norm(f"{p}.norm1"),
            "attn": {"qkv": dense(f"{p}.attn.qkv"), "proj": dense(f"{p}.attn.proj")},
            "norm2": norm(f"{p}.norm2"),
            "mlp": {"fc1": dense(f"{p}.mlp.fc1"), "fc2": dense(f"{p}.mlp.fc2")},
        }

    params["norm"] = norm("norm")

    # --- classifier heads ---------------------------------------------------
    # Reference head = Sequential(LayerNorm, Linear) -> keys head.0 / head.1
    # (passt.py:463-464). ImageNet ViTs have a plain Linear "head". Heads are
    # dropped (random init kept) when num_classes differs
    # (vit_helpers.py:120-130).
    def head_matches(key):
        return key in sd and sd[key].shape[0] == cfg.num_classes

    if "head.1.weight" in sd:
        if head_matches("head.1.weight"):
            params["head_norm"] = norm("head.0")
            params["head_linear"] = dense("head.1")
        else:
            warnings.warn("checkpoint classifier dropped (num_classes mismatch)")
            for k in ("head.0.weight", "head.0.bias", "head.1.weight", "head.1.bias"):
                consumed.add(k)
    elif "head.weight" in sd:
        warnings.warn("ImageNet plain-Linear head dropped (PaSST head is LayerNorm+Linear)")
        consumed.update({"head.weight", "head.bias"})

    if "head_dist.weight" in sd:
        if cfg.distilled and head_matches("head_dist.weight"):
            params["head_dist"] = dense("head_dist")
        else:
            consumed.update({"head_dist.weight", "head_dist.bias"})

    if "pre_logits.fc.weight" in sd:
        if cfg.representation_size and not cfg.distilled:
            params["pre_logits"] = dense("pre_logits.fc")
        else:
            # fine-tuning drops the representation layer
            # (reference _create_vision_transformer, passt.py:717-722)
            consumed.update({"pre_logits.fc.weight", "pre_logits.fc.bias"})

    # --- fill gaps from init, check leftovers -------------------------------
    if init_params is not None:
        for name in ("head_norm", "head_linear", "head_dist", "dist_token"):
            if name not in params and name in init_params:
                params[name] = init_params[name]

    leftovers = {k for k in sd if k not in consumed and not k.startswith("pre_logits")}
    if leftovers and strict:
        raise ValueError(f"unconverted checkpoint keys: {sorted(leftovers)[:8]} ...")
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pt`` pickle into a flat numpy state dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and not hasattr(obj["model"], "shape"):
        obj = obj["model"]
    return {k: _t(v) for k, v in obj.items()}


def save_params_npz(path: str, params: dict) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        out[name] = np.asarray(leaf)
    np.savez(path, **out)


def load_params_npz(path: str) -> dict:
    data = np.load(path)
    tree: dict = {}
    for name in data.files:
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[name])
    return tree


def stack_block_params(params: dict) -> dict:
    """Per-block layout (``blocks_0..blocks_{D-1}``, the checkpoint/at-rest
    form) -> scan layout (``blocks/block`` with [D, ...] stacked leaves) —
    the pure reshape the ``blocks_impl='scan'`` model consumes. The two
    layouts are numerically interchangeable; this is layout, not surgery."""
    import jax

    depth = len([k for k in params if k.startswith("blocks_")])
    if depth == 0:
        return params
    per_block = [params[f"blocks_{i}"] for i in range(depth)]
    out = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    out["blocks"] = {"block": jax.tree.map(lambda *xs: jnp.stack(xs), *per_block)}
    return out


def unstack_block_params(params: dict) -> dict:
    """Inverse of :func:`stack_block_params` (scan -> per-block layout)."""
    import jax

    if "blocks" not in params:
        return params
    stacked = params["blocks"]["block"]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    out = {k: v for k, v in params.items() if k != "blocks"}
    for i in range(depth):
        out[f"blocks_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def _match_block_layout(params: dict, init_params: dict) -> dict:
    """Re-lay ``params`` (either block layout) to match the model template's
    layout, so every load path accepts checkpoints written by either
    ``blocks_impl``."""
    want_scan = "blocks" in init_params
    have_scan = "blocks" in params
    if want_scan and not have_scan:
        return stack_block_params(params)
    if have_scan and not want_scan:
        return unstack_block_params(params)
    return params


def load_pretrained_params(path: str, cfg: PaSSTConfig, init_params: dict) -> dict:
    """Port a checkpoint file (.pt torch pickle or .npz converted tree).
    The block layout (per-block vs scan-stacked) is adapted to whatever
    layout ``init_params`` (the built model) uses."""
    if path.endswith(".npz"):
        return _match_block_layout(load_params_npz(path), init_params)
    import os

    if os.path.isdir(path):
        raise ValueError(
            f"checkpoint_path {path!r} is a directory — this loader takes a "
            "ported .npz or a torch .pt file. Orbax training checkpoint "
            "directories are restored via trainer.checkpoint_dir / "
            "passt_tpu.train.loop.restore_checkpoint instead."
        )
    sd = load_torch_checkpoint(path)
    converted = convert_torch_state_dict(sd, cfg, init_params=init_params)
    return _match_block_layout(converted, init_params)
