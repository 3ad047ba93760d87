"""PaSST — Patchout faSt Spectrogram Transformer, TPU-native.

A from-scratch flax.linen implementation of the reference architecture
(reference: models/passt.py:271-595; arXiv 2110.05069): a pre-norm ViT over
spectrogram patches with

- a strided patch-embedding conv (patch 16x16, stride (fstride, tstride),
  reference passt.py:298-328),
- **disentangled positional embeddings**: separate frequency and time
  embeddings added on the 2-D patch grid, plus a token embedding for the
  CLS/DIST tokens (passt.py:438-440, 506-529),
- **patchout** regularization: during training, structured patchout drops
  whole time columns / frequency rows of the patch grid, unstructured
  patchout drops random tokens from the flattened sequence
  (passt.py:531-553),
- CLS + distillation tokens; the classification head is
  LayerNorm -> Linear applied to the *mean* of the two final tokens
  (passt.py:463-467, 576-588). The distillation head exists in checkpoints
  but is unused in the reference forward — kept here for checkpoint parity.

TPU-first design notes
----------------------
- Layout is NHWC ([B, F, T, C]) end to end — the native TPU conv layout;
  flattening [B, F', T', D] row-major reproduces the reference's
  frequency-major token order (torch ``flatten(2)`` of [B, D, F, T]).
- All patchout is **static-shape**: a sorted random subset of indices is
  gathered with ``jnp.take``, so the sequence length is a compile-time
  constant (seq = (F'-s_f)*(T'-s_t) - u + tokens) and everything jits once.
- train/eval asymmetry is a static ``train`` argument (two compiled graphs),
  randomness comes from named flax RNG streams: ``patchout``, ``dropout``,
  ``droppath``.
- Matmuls run in a configurable ``dtype`` (bfloat16 for training) with fp32
  parameters and fp32 LayerNorm/softmax for stability.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from passt_tpu.ops.activations import tanh_gelu
from passt_tpu.ops.pallas.layernorm import layer_norm as fused_layer_norm

Dtype = jnp.dtype


class FusedLayerNorm(nn.Module):
    """``nn.LayerNorm(epsilon, dtype=float32)``-compatible module whose
    backward runs as one Pallas pass (ops/pallas/layernorm.py). Identical
    parameters (fp32 ``scale``/``bias`` under the same scope) — checkpoints
    are interchangeable with the XLA module."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return fused_layer_norm(x, scale, bias, eps=self.epsilon)


def _ln(fused: bool, name: str, epsilon: float = 1e-6) -> nn.Module:
    """Pick the LayerNorm implementation (same params/semantics either way)."""
    if fused:
        return FusedLayerNorm(epsilon=epsilon, name=name)
    return nn.LayerNorm(epsilon=epsilon, dtype=jnp.float32, name=name)


@dataclasses.dataclass(frozen=True)
class PaSSTConfig:
    """Model hyperparameters (defaults = reference PaSST defaults,
    passt.py:391-395, with the AudioSet recipe's patchout at
    ex_audioset.py:62-63 applied by presets, not here)."""

    input_fdim: int = 128
    input_tdim: int = 998
    patch_size: Tuple[int, int] = (16, 16)
    stride: Tuple[int, int] = (10, 10)
    in_chans: int = 1
    num_classes: int = 527
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    distilled: bool = True
    representation_size: Optional[int] = None  # pre-logits Dense+tanh
    # (reference passt.py:452-460; only for non-distilled in21k ViTs)
    u_patchout: int = 0
    s_patchout_t: int = 0
    s_patchout_f: int = 0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: str = "float32"  # computation dtype ("bfloat16" for training)
    gelu: str = "auto"  # "erf" (torch nn.GELU, the reference), "tanh"
    # (the classic GPT/BERT approximation), or "auto": erf under fp32
    # (exact reference parity), tanh under bf16 — where the erf/tanh
    # difference (max logit delta 1.5e-2) is indistinguishable from bf16
    # rounding itself (1.6e-2 vs fp32-erf) but the exact-erf VPU
    # transcendentals cost 22% of the whole fwd+bwd step (7.8 ms of
    # 35.3 ms at B=12, measured; see PARITY.md "Performance notes").
    gelu_saved_deriv: bool = True  # tanh-GELU only: save gelu'(x) in fwd
    # (shares the fwd tanh — a few FMAs under the matmul epilogue, same
    # residual bytes) so backward is one multiply with zero
    # transcendentals; False restores standard AD (ops/activations.py)
    ln_impl: str = "auto"  # block LayerNorms: "xla" (nn.LayerNorm) or
    # "fused" (Pallas one-pass backward, ops/pallas/layernorm.py — a
    # measured DEAD END in the train graph: standalone LN-bwd is 5x off
    # its HBM floor, but the custom_vjp boundary costs more fusion than
    # the kernel reclaims, full step 31.54 -> 33.62 ms); "auto" = xla
    remat: bool = False  # rematerialize blocks in backward (HBM-traffic relief)
    softmax_fp32: bool = True  # fp32 attention softmax (False: bf16, faster)
    patch_embed_impl: str = "unfold"  # "unfold": frame-decomposed MXU
    # matmuls (free stride-granular reshape + 4 dot_generals); "conv": XLA
    # conv. The overlapping stride-10 16x16 conv lowers at ~3% MXU
    # efficiency on TPU (full step 32.40 vs 31.39 ms unfold, B=12); both
    # share the exact nn.Conv parameter layout so checkpoints are
    # interchangeable (see PatchEmbed).
    attn_impl: str = "auto"  # "fused" (Pallas VMEM-resident kernel, fp32
    # softmax, recompute-in-backward — ops/pallas/attention.py), "xla"
    # (einsum composition), or "auto": fused on TPU, xla elsewhere.
    plus1_attn: bool = False  # "+1 trick": softmax over [logits, 0] so rows
    # may sum to <1 (quiet attention; reference PLUS1_TRICK module global,
    # passt.py:295 + 349-355 — hardcoded False there, a real option here)
    verbose_shapes: bool = False  # print stage shapes at trace time
    # (the reference's first_RUN shape tracing, passt.py:507-594)
    fuse_ln_qkv: bool = False  # absorb norm1 into the flat attention
    # custom boundary (ops/pallas/ln_qkv.py): one Pallas pass for
    # LN -> qkv GEMM in the forward and for dqkv@W^T -> LN-backward in the
    # backward, with the dW GEMM left in XLA so it keeps its optimizer
    # epilogue fusion. Geometry-gated (ln_qkv_supports); params identical
    # to the module path. Requires attn_impl fused and ln_impl xla.
    blocks_impl: str = "loop"  # "loop": depth separate Block modules
    # (params blocks_0..blocks_{depth-1} — the reference's nn.Sequential
    # layout, passt.py:444-448); "scan": ONE Block scanned over stacked
    # [depth, ...] params (lax.scan via nn.scan). Identical math per
    # block; what changes is the BACKWARD graph: the 12 per-block
    # weight-grad GEMMs + their fused optimizer epilogues (profiled at
    # 6.20 ms/step, 39-50% MXU, PARITY.md "Profile attribution") become
    # one scan with a single GEMM instance + ONE stacked optimizer
    # fusion over [12, ...] leaves. Checkpoints interconvert by a pure
    # stack/unstack (models/pretrained.py stack_block_params).

    @property
    def grid_size(self) -> Tuple[int, int]:
        """(F_grid, T_grid) of the patch-embedding output for the nominal
        input size (reference passt.py:311)."""
        return (
            (self.input_fdim - self.patch_size[0]) // self.stride[0] + 1,
            (self.input_tdim - self.patch_size[1]) // self.stride[1] + 1,
        )

    @property
    def num_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def use_fused_attn(self) -> bool:
        """Resolve ``attn_impl`` ("auto": Pallas kernel on TPU only — off-TPU
        the kernel would run interpreted, correct but slow)."""
        if self.attn_impl == "auto":
            return jax.default_backend() == "tpu"
        if self.attn_impl not in ("fused", "xla"):
            raise ValueError(
                f"attn_impl must be 'auto'|'fused'|'xla', got {self.attn_impl!r}"
            )
        return self.attn_impl == "fused"

    @property
    def use_fused_ln(self) -> bool:
        """Resolve ``ln_impl``. "auto" is XLA: unlike attention, the
        Pallas LN backward LOSES in-graph (see ``ln_impl`` comment) —
        "fused" is an explicit opt-in kept for the measured bounds
        record and for exercising the kernel under GSPMD."""
        if self.ln_impl == "auto":
            return False
        if self.ln_impl not in ("fused", "xla"):
            raise ValueError(
                f"ln_impl must be 'auto'|'fused'|'xla', got {self.ln_impl!r}"
            )
        return self.ln_impl == "fused"

    @property
    def gelu_approximate(self) -> bool:
        """True when the tanh GELU approximation should be used."""
        if self.gelu == "auto":
            return self.compute_dtype == jnp.bfloat16
        if self.gelu not in ("erf", "tanh"):
            raise ValueError(f"gelu must be 'auto'|'erf'|'tanh', got {self.gelu!r}")
        return self.gelu == "tanh"

    @property
    def use_scan_blocks(self) -> bool:
        """Resolve ``blocks_impl``. The scan/stacked forms require a
        uniform per-block static config, so the stochastic-depth decay
        rule (per-block drop_path rates) is out of scope — the production
        recipes all train at drop_path_rate 0 (ex_audioset.py:62-63
        family sets patchout, not droppath)."""
        if self.blocks_impl not in ("loop", "scan", "stacked"):
            raise ValueError(
                f"blocks_impl must be 'loop'|'scan'|'stacked', got "
                f"{self.blocks_impl!r}"
            )
        if self.blocks_impl != "loop" and self.drop_path_rate > 0.0:
            raise NotImplementedError(
                f"blocks_impl={self.blocks_impl!r} requires drop_path_rate "
                "== 0 (per-block stochastic-depth rates need the unrolled "
                "'loop' form)"
            )
        if self.blocks_impl == "stacked":
            # the hand-written stack backward (models/stacked_blocks.py)
            # covers the production train graph: no in-block dropout
            if self.drop_rate > 0.0 or self.attn_drop_rate > 0.0:
                raise NotImplementedError(
                    "blocks_impl='stacked' requires drop_rate == "
                    "attn_drop_rate == 0 (no dropout in the hand-written "
                    "stack backward; use 'loop')"
                )
            if not self.qkv_bias:
                raise NotImplementedError(
                    "blocks_impl='stacked' assumes qkv_bias=True (every "
                    "published PaSST config; use 'loop' otherwise)"
                )
            # knobs the stacked implementation cannot honor must fail
            # loudly, not silently measure the same graph twice
            if self.attn_impl == "xla":
                raise NotImplementedError(
                    "blocks_impl='stacked' always uses the flat Pallas "
                    "attention (with its internal fallback); attn_impl="
                    "'xla' is not honored — use 'loop' to A/B attention"
                )
            if not self.softmax_fp32:
                raise NotImplementedError(
                    "blocks_impl='stacked' computes fp32 attention "
                    "softmax unconditionally; softmax_fp32=False is not "
                    "honored — use 'loop'"
                )
            if self.remat:
                raise NotImplementedError(
                    "blocks_impl='stacked' has a hand-written backward; "
                    "remat is not honored — use 'loop' or 'scan'"
                )
            if self.fuse_ln_qkv:
                raise NotImplementedError(
                    "blocks_impl='stacked' ignores fuse_ln_qkv (its own "
                    "fused norms are hand-written); A/B fuse_ln_qkv under "
                    "'loop'"
                )
            if self.use_fused_ln:
                raise NotImplementedError(
                    "blocks_impl='stacked' ignores ln_impl='fused' for "
                    "block norms — use 'loop'"
                )
        if self.fuse_ln_qkv:
            # definitively-contradictory combinations raise; the 'auto'
            # off-TPU / geometry cases remain runtime gates like
            # attn_impl='auto' itself
            if self.use_fused_ln:
                raise NotImplementedError(
                    "fuse_ln_qkv absorbs norm1 into the attention "
                    "boundary and cannot combine with ln_impl='fused'"
                )
            if self.attn_impl == "xla":
                raise NotImplementedError(
                    "fuse_ln_qkv requires the fused attention kernel; "
                    "attn_impl='xla' contradicts it"
                )
        return self.blocks_impl == "scan"

    def seq_len(self, train: bool, f_grid: Optional[int] = None, t_grid: Optional[int] = None) -> int:
        """Static transformer sequence length (incl. CLS/DIST tokens)."""
        f = self.grid_size[0] if f_grid is None else f_grid
        t = self.grid_size[1] if t_grid is None else t_grid
        if train:
            f = f - self.s_patchout_f
            t = t - self.s_patchout_t
            return f * t - self.u_patchout + self.num_tokens
        return f * t + self.num_tokens


def trunc_normal_init(std: float = 0.02):
    """timm/torch ``trunc_normal_(std=.02, a=-2., b=2.)``: the bounds are
    ABSOLUTE (±2.0), i.e. ±100σ at std 0.02 — effectively an untruncated
    N(0, std). flax's ``truncated_normal`` takes bounds in σ units and does
    not re-normalize variance, so passing lower=-2σ would clip at ±0.04 and
    shrink the effective std to ~0.0176; divide by std to express the
    reference's absolute bounds."""
    return nn.initializers.truncated_normal(
        stddev=std, lower=-2.0 / std, upper=2.0 / std
    )


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default (kaiming_uniform a=sqrt(5)) for HWIO kernels —
    the reference leaves the patch conv at the torch default (passt.py:623-624
    note)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def drop_path(x: jnp.ndarray, rate: float, rng: jax.Array) -> jnp.ndarray:
    """Stochastic depth on the batch axis (reference vit_helpers.py:203-233)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _sorted_keep_indices(rng: jax.Array, size: int, keep: int) -> jnp.ndarray:
    """A sorted random subset of ``keep`` indices out of ``size`` — the
    patchout selection semantics (torch.randperm[:keep].sort(),
    reference passt.py:535, 541, 551), with a static output shape."""
    perm = jax.random.permutation(rng, size)
    return jnp.sort(perm[:keep])


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float
    dtype: Dtype
    gelu_approximate: bool = False  # torch nn.GELU is the exact erf form;
    # tanh is bit-equivalent at bf16 precision and much cheaper (see
    # PaSSTConfig.gelu)
    gelu_saved_deriv: bool = True  # tanh path only: custom-VJP GELU that
    # saves the derivative in fwd (shares the fwd tanh, hides under the
    # matmul epilogue) so the backward is one multiply with zero
    # transcendentals (ops/activations.py; AD recomputes tanh' at
    # 1.87 ms/step, PARITY.md)

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.hidden, dtype=self.dtype, kernel_init=trunc_normal_init(), name="fc1")(x)
        if self.gelu_approximate and self.gelu_saved_deriv:
            x = tanh_gelu(x)
        else:
            x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out, dtype=self.dtype, kernel_init=trunc_normal_init(), name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class _LNParams(nn.Module):
    """Declare LayerNorm affine params (``scale``/``bias``) without the
    computation — identical names/shapes/init/dtype to ``nn.LayerNorm``,
    so checkpoints are interchangeable with the module path. Used by the
    fused norm1+qkv+attention path, which consumes the raw params."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Declare Dense params (``kernel``/``bias``) without the computation —
    identical to the ``nn.Dense(kernel_init=trunc_normal_init())`` the
    module path creates under the same scope."""

    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", trunc_normal_init(), (in_dim, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention (reference passt.py:331-361).

    ``fused=True`` routes through the Pallas VMEM-resident kernel
    (:func:`passt_tpu.ops.pallas.attention.fused_attention`) whenever the
    geometry supports it and attention dropout is inactive; the XLA einsum
    composition below remains the behavioral reference and the fallback.
    The fused kernel always computes fp32 scores/softmax (i.e. it implies
    ``softmax_fp32`` semantics — measured neutral vs bf16 softmax anyway,
    see PARITY.md)."""

    dim: int
    num_heads: int
    qkv_bias: bool
    attn_drop: float
    proj_drop: float
    dtype: Dtype
    softmax_fp32: bool = True
    plus1: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool, ln=None):
        from passt_tpu.ops.pallas.attention import (
            flat_kernel_supports,
            fused_attention,
            fused_attention_qkv,
            kernel_supports,
        )

        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        if ln is not None:
            # ``ln=(scale, bias)``: x arrives PRE-norm1; fuse norm1 into the
            # qkv projection + attention (ops/pallas/ln_qkv.py) when the
            # geometry fits, else apply the identical LN math inline (fp32
            # fast-variance, == nn.LayerNorm(dtype=f32)) and fall through
            # to the standard paths below.
            from passt_tpu.ops.pallas.ln_qkv import (
                fused_ln_qkv_attention,
                ln_qkv_supports,
                ln_stats,
            )

            itemsize = jnp.dtype(self.dtype).itemsize
            fused_ok = self.fused and not (train and self.attn_drop > 0.0)
            if fused_ok and ln_qkv_supports(
                n, self.num_heads, head_dim, backward=train, itemsize=itemsize,
                batch=b,
            ):
                qkv_kernel, qkv_bias = _DenseParams(
                    self.dim * 3, self.qkv_bias, name="qkv"
                )(c)
                out = fused_ln_qkv_attention(
                    x.astype(self.dtype), ln[0], ln[1], qkv_kernel,
                    qkv_bias if qkv_bias is not None else jnp.zeros(
                        (self.dim * 3,), jnp.float32
                    ),
                    heads=self.num_heads, head_dim=head_dim, scale=scale,
                    plus1=self.plus1,
                )
                out = nn.Dense(
                    self.dim, dtype=self.dtype, kernel_init=trunc_normal_init(),
                    name="proj",
                )(out)
                return nn.Dropout(self.proj_drop, deterministic=not train)(out)
            xf = x.astype(jnp.float32)
            mu, rstd = ln_stats(xf, 1e-6)
            x = ((xf - mu) * rstd * ln[0] + ln[1]).astype(self.dtype)

        qkv_flat = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            kernel_init=trunc_normal_init(), name="qkv",
        )(x)

        # Kernel selection (attn dropout excluded from both fused paths;
        # backward=train picks the larger forward-only VMEM ceilings at
        # eval lengths — if someone differentiates through an eval-mode
        # apply anyway (saliency), each kernel's own backward falls back
        # to an XLA composition past its VMEM bound):
        #  1. flat qkv-boundary kernel (train geometry; zero glue —
        #     consumes the qkv Dense output, feeds the proj Dense, and the
        #     VJP emits dqkv in the Dense-backward layout directly),
        #  2. [B, H, N, D] kernel (larger geometries, e.g. eval N=1190 —
        #     the flat kernel's full-row blocks exceed VMEM there),
        #  3. the XLA einsum composition below (the behavioral reference).
        fused_ok = self.fused and not (train and self.attn_drop > 0.0)
        itemsize = jnp.dtype(self.dtype).itemsize
        if fused_ok and flat_kernel_supports(
            n, self.num_heads, head_dim, backward=train, itemsize=itemsize,
            batch=b,
        ):
            out = fused_attention_qkv(
                qkv_flat, heads=self.num_heads, head_dim=head_dim,
                scale=scale, plus1=self.plus1,
            )
            out = nn.Dense(
                self.dim, dtype=self.dtype, kernel_init=trunc_normal_init(), name="proj"
            )(out)
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        qkv = qkv_flat.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, Dh]

        if fused_ok and kernel_supports(n, head_dim, backward=train):
            out = fused_attention(q, k, v, scale=scale, plus1=self.plus1)
            out = out.reshape(b, n, c)
            out = nn.Dense(
                self.dim, dtype=self.dtype, kernel_init=trunc_normal_init(), name="proj"
            )(out)
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        if self.plus1:
            # "+1 trick" (reference PLUS1_TRICK, passt.py:349-355): append a
            # zero logit before softmax and drop it after, so a head can
            # attend to nothing (rows sum to < 1).
            attn = jnp.concatenate(
                [attn, jnp.zeros(attn.shape[:-1] + (1,), attn.dtype)], axis=-1
            )
        if self.softmax_fp32:
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        else:
            # bf16 softmax with the max-subtraction still computed exactly;
            # saves the fp32 NxN materialization (memory-bound relief).
            attn = jax.nn.softmax(attn, axis=-1)
        if self.plus1:
            attn = attn[..., :-1]
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)

        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype, kernel_init=trunc_normal_init(), name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class Block(nn.Module):
    """Pre-norm transformer block (reference passt.py:364-380)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path_rate: float
    dtype: Dtype
    softmax_fp32: bool = True
    plus1: bool = False
    gelu_approximate: bool = False
    gelu_saved_deriv: bool = True
    fused_attn: bool = False
    fused_ln: bool = False
    fuse_ln_qkv: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        def maybe_drop_path(y):
            if train and self.drop_path_rate > 0.0:
                return drop_path(y, self.drop_path_rate, self.make_rng("droppath"))
            return y

        attn = Attention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            dtype=self.dtype, softmax_fp32=self.softmax_fp32, plus1=self.plus1,
            fused=self.fused_attn, name="attn",
        )
        if self.fuse_ln_qkv and self.fused_attn and not self.fused_ln:
            # norm1 absorbed into the attention custom boundary
            # (ops/pallas/ln_qkv.py); params stay at norm1/{scale,bias} —
            # checkpoint-identical to the module path.
            s_, b_ = _LNParams(self.dim, name="norm1")()
            h = attn(x.astype(self.dtype), train, ln=(s_, b_))
        else:
            h = _ln(self.fused_ln, "norm1")(x)
            h = attn(h.astype(self.dtype), train)
        x = x + maybe_drop_path(h)
        h = _ln(self.fused_ln, "norm2")(x)
        h = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, self.drop, dtype=self.dtype,
            gelu_approximate=self.gelu_approximate,
            gelu_saved_deriv=self.gelu_saved_deriv, name="mlp",
        )(h.astype(self.dtype), train)
        return x + maybe_drop_path(h)


class _StackedLNParams(nn.Module):
    """Stacked [depth, C] LayerNorm affine params (scan-layout leaves)."""

    depth: int
    dim: int

    @nn.compact
    def __call__(self):
        return {
            "scale": self.param(
                "scale", nn.initializers.ones, (self.depth, self.dim), jnp.float32
            ),
            "bias": self.param(
                "bias", nn.initializers.zeros, (self.depth, self.dim), jnp.float32
            ),
        }


class _StackedDenseParams(nn.Module):
    """Stacked [depth, in, out] Dense params (same init family as the
    per-block nn.Dense(kernel_init=trunc_normal_init()) — iid elements, so
    one stacked draw is distribution-identical to depth separate draws)."""

    depth: int
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return {
            "kernel": self.param(
                "kernel", trunc_normal_init(), (self.depth, self.din, self.dout)
            ),
            "bias": self.param(
                "bias", nn.initializers.zeros, (self.depth, self.dout)
            ),
        }


class _StackedAttnParams(nn.Module):
    depth: int
    dim: int

    @nn.compact
    def __call__(self):
        return {
            "qkv": _StackedDenseParams(self.depth, self.dim, 3 * self.dim, name="qkv")(),
            "proj": _StackedDenseParams(self.depth, self.dim, self.dim, name="proj")(),
        }


class _StackedMlpParams(nn.Module):
    depth: int
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return {
            "fc1": _StackedDenseParams(self.depth, self.dim, self.hidden, name="fc1")(),
            "fc2": _StackedDenseParams(self.depth, self.hidden, self.dim, name="fc2")(),
        }


class _StackedBlockParams(nn.Module):
    """The full 'block' stacked subtree — scope path ``blocks/block/...``
    matches the nn.scan layout leaf-for-leaf, so 'scan' and 'stacked'
    checkpoints are interchangeable and stack_block_params covers both."""

    depth: int
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return {
            "norm1": _StackedLNParams(self.depth, self.dim, name="norm1")(),
            "attn": _StackedAttnParams(self.depth, self.dim, name="attn")(),
            "norm2": _StackedLNParams(self.depth, self.dim, name="norm2")(),
            "mlp": _StackedMlpParams(self.depth, self.dim, self.hidden, name="mlp")(),
        }


class _StackedBlocksHolder(nn.Module):
    depth: int
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return {
            "block": _StackedBlockParams(
                self.depth, self.dim, self.hidden, name="block"
            )()
        }


class _BlockScanStep(nn.Module):
    """One ``nn.scan`` step over the transformer depth: the SAME
    :class:`Block` math under a ``block`` scope, with params stacked
    [depth, ...] on axis 0 by the scan's ``variable_axes``. ``train`` is
    an attribute (not a call arg) so the scan body signature stays the
    canonical ``(carry, x) -> (carry, y)``."""

    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    dtype: Dtype
    train: bool
    softmax_fp32: bool = True
    plus1: bool = False
    gelu_approximate: bool = False
    gelu_saved_deriv: bool = True
    fused_attn: bool = False
    fused_ln: bool = False
    fuse_ln_qkv: bool = False

    @nn.compact
    def __call__(self, x, _):
        y = Block(
            self.dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
            self.drop, self.attn_drop, 0.0, dtype=self.dtype,
            softmax_fp32=self.softmax_fp32, plus1=self.plus1,
            gelu_approximate=self.gelu_approximate,
            gelu_saved_deriv=self.gelu_saved_deriv,
            fused_attn=self.fused_attn, fused_ln=self.fused_ln,
            fuse_ln_qkv=self.fuse_ln_qkv,
            name="block",
        )(x, self.train)
        return y, None


class PatchEmbed(nn.Module):
    """Strided conv patch embedding, NHWC (reference passt.py:298-328)."""

    embed_dim: int
    patch_size: Tuple[int, int]
    stride: Tuple[int, int]
    in_chans: int
    dtype: Dtype

    unfold: bool = True  # True: frame-decomposed dot_generals (see
    # _UnfoldProj); False: XLA conv. The overlapping stride-10 16x16 conv
    # lowers at ~3% MXU efficiency on TPU (measured 1.29 ms fwd at B=12 vs
    # 0.03 ms matmul-ideal; full train step 32.40 -> 31.39 ms with the
    # frame formulation). Identical parameters (HWIO kernel + bias under
    # the same 'proj' scope) — checkpoints are interchangeable; outputs
    # agree to fp32-accumulation tolerance.

    @nn.compact
    def __call__(self, x):
        if not self.unfold:
            fan_in = self.patch_size[0] * self.patch_size[1] * self.in_chans
            return nn.Conv(
                self.embed_dim,
                kernel_size=self.patch_size,
                strides=self.stride,
                padding="VALID",
                dtype=self.dtype,
                kernel_init=torch_conv_kernel_init,
                bias_init=torch_conv_bias_init(fan_in),
                name="proj",
            )(x)
        return _UnfoldProj(
            self.embed_dim, self.patch_size, self.stride, self.in_chans,
            self.dtype, name="proj",
        )(x)


class _UnfoldProj(nn.Module):
    """Patch embedding as frame-decomposed MXU matmuls, with nn.Conv's
    exact parameter layout (HWIO ``kernel`` + ``bias``) so checkpoints are
    interchangeable with the conv formulation (reference conv:
    models/passt.py:298-328)."""

    embed_dim: int
    patch_size: Tuple[int, int]
    stride: Tuple[int, int]
    in_chans: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        ph, pw = self.patch_size
        sf, st = self.stride
        fan_in = ph * pw * self.in_chans
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (ph, pw, self.in_chans, self.embed_dim)
        )
        bias = self.param("bias", torch_conv_bias_init(fan_in), (self.embed_dim,))
        b, f, t, c = x.shape
        fg = (f - ph) // sf + 1
        tg = (t - pw) // st + 1
        # Frame decomposition: pad so both spatial axes tile exactly by the
        # stride, then [B, Fp, Tp, C] -> [B, Fp/sf, sf, Tp/st, st, C] is a
        # FREE reshape (row-major split, no data movement). A window tap
        # (u, v) lives in frame (p + u//sf, q + v//st) at in-frame offset
        # (u%sf, v%st), so the overlapping conv becomes a short sum (4
        # terms at the flagship 16x16/stride-10 geometry) of dot_generals,
        # each contracting a contiguous tap block of the HWIO kernel with a
        # frame-offset slice — no transposes, no strided copies, and the
        # whole projection lands on the MXU. (A 256-strided-slice im2col
        # variant was A/B'd first: 38.8 vs 32.4 ms full step — the C=1
        # minor-dim slices are lane-hostile; see PARITY.md dead ends.)
        na = (ph - 1) // sf  # extra F-frames a window reaches into
        nb = (pw - 1) // st
        fp = (fg + na) * sf
        tp = (tg + nb) * st
        # Per-axis: crop when the tiled extent is short of the input (the
        # tail rows past the last window are unused), pad when it overruns
        # (a window's tail taps land in an extra all-zero frame) — the two
        # can mix (e.g. 64x48 @ 16/10: fp=60<64 while tp=50>48).
        xc = x.astype(self.dtype)[:, : min(fp, f), : min(tp, t), :]
        if fp > f or tp > t:
            xc = jnp.pad(
                xc, ((0, 0), (0, max(0, fp - f)), (0, max(0, tp - t)), (0, 0))
            )
        frames = xc.reshape(b, fp // sf, sf, tp // st, st, c)
        out = None
        for a in range(na + 1):
            ra = min(sf, ph - a * sf)
            for bb in range(nb + 1):
                rb = min(st, pw - bb * st)
                lhs = frames[:, a : a + fg, :ra, bb : bb + tg, :rb, :]
                rhs = kernel[a * sf : a * sf + ra, bb * st : bb * st + rb].astype(
                    self.dtype
                )  # [ra, rb, C, E]
                term = jax.lax.dot_general(
                    lhs,
                    rhs,
                    dimension_numbers=(((2, 4, 5), (0, 1, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [B, Fg, Tg, E]
                out = term if out is None else out + term
        return (out + bias).astype(self.dtype)


class PaSST(nn.Module):
    """The PaSST transformer. Input: [B, C, F, T] spectrogram (the reference
    call convention); returns ``(logits [B, num_classes], features [B, D])``
    exactly like the reference forward (passt.py:576-595)."""

    cfg: PaSSTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        b = x.shape[0]
        d = cfg.embed_dim

        # Parameters mirroring the reference state dict (passt.py:434-440).
        cls_token = self.param("cls_token", trunc_normal_init(), (1, 1, d))
        dist_token = (
            self.param("dist_token", trunc_normal_init(), (1, 1, d)) if cfg.distilled else None
        )
        new_pos_embed = self.param("new_pos_embed", trunc_normal_init(), (1, cfg.num_tokens, d))
        f_grid, t_grid = cfg.grid_size
        freq_pos_embed = self.param("freq_new_pos_embed", trunc_normal_init(), (1, f_grid, 1, d))
        time_pos_embed = self.param("time_new_pos_embed", trunc_normal_init(), (1, 1, t_grid, d))

        def trace(label, arr):
            if cfg.verbose_shapes:  # prints once per compile, like first_RUN
                print(f" {label}: {arr.shape}")

        trace("input", x)
        # [B, C, F, T] -> NHWC [B, F, T, C] (TPU-native conv layout).
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)
        x = PatchEmbed(
            d, cfg.patch_size, cfg.stride, cfg.in_chans, dtype=dtype,
            unfold=(cfg.patch_embed_impl == "unfold"), name="patch_embed"
        )(x)  # [B, F', T', D]
        trace("patch_embed", x)
        _, f_cur, t_cur, _ = x.shape

        # Time embedding: crop to the actual grid, random offset in training
        # (reference passt.py:513-527). Inputs longer than the embedding are
        # truncated, mirroring the reference warning path (passt.py:523-526).
        if t_cur < t_grid:
            if train:
                offset = jax.random.randint(
                    self.make_rng("patchout"), (), 0, t_grid - t_cur + 1
                )
                tpe = jax.lax.dynamic_slice(
                    time_pos_embed, (0, 0, offset, 0), (1, 1, t_cur, d)
                )
            else:
                tpe = time_pos_embed[:, :, :t_cur, :]
        else:
            x = x[:, :, :t_grid, :]
            t_cur = t_grid
            tpe = time_pos_embed
        x = x + tpe.astype(dtype)

        assert f_cur == f_grid, (
            f"input frequency grid {f_cur} != positional embedding grid {f_grid}"
        )
        x = x + jnp.reshape(freq_pos_embed, (1, f_grid, 1, d)).astype(dtype)

        # Structured patchout (training only, reference passt.py:531-543).
        if train and cfg.s_patchout_t:
            keep = _sorted_keep_indices(self.make_rng("patchout"), t_cur, t_cur - cfg.s_patchout_t)
            x = jnp.take(x, keep, axis=2)
            t_cur -= cfg.s_patchout_t
        if train and cfg.s_patchout_f:
            keep = _sorted_keep_indices(self.make_rng("patchout"), f_cur, f_cur - cfg.s_patchout_f)
            x = jnp.take(x, keep, axis=1)
            f_cur -= cfg.s_patchout_f

        trace("after structured patchout", x)
        # Flatten (frequency-major, like torch flatten(2) on [B,D,F,T]).
        x = x.reshape(b, f_cur * t_cur, d)

        # Unstructured patchout (reference passt.py:549-553).
        if train and cfg.u_patchout:
            seq = x.shape[1]
            keep = _sorted_keep_indices(self.make_rng("patchout"), seq, seq - cfg.u_patchout)
            x = jnp.take(x, keep, axis=1)

        # CLS / DIST tokens with their own positional embedding (passt.py:557-564).
        cls = (cls_token + new_pos_embed[:, :1, :]).astype(dtype)
        cls = jnp.broadcast_to(cls, (b, 1, d))
        if cfg.distilled:
            dist = (dist_token + new_pos_embed[:, 1:, :]).astype(dtype)
            dist = jnp.broadcast_to(dist, (b, 1, d))
            x = jnp.concatenate([cls, dist, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)

        trace("final sequence", x)
        x = nn.Dropout(cfg.drop_rate, deterministic=not train)(x)

        cfg.use_scan_blocks  # validate blocks_impl + its constraints
        if cfg.blocks_impl == "stacked":
            # Unrolled forward over stacked [depth, ...] params with the
            # hand-written deferred-batched-dW backward
            # (models/stacked_blocks.py). Params live at blocks/block/...
            # exactly like the scan layout.
            from passt_tpu.models.stacked_blocks import stacked_blocks_apply

            stacked = _StackedBlocksHolder(
                cfg.depth, d, int(d * cfg.mlp_ratio), name="blocks"
            )()["block"]
            head_dim = d // cfg.num_heads
            x = stacked_blocks_apply(
                stacked,
                x,
                cfg.num_heads,
                cfg.plus1_attn,
                head_dim ** -0.5,
                jax.default_backend() != "tpu",
                cfg.gelu_approximate,
                train,
            )
        elif cfg.use_scan_blocks:
            # One Block, scanned over stacked [depth, ...] params: the
            # backward becomes a reverse scan with ONE weight-grad GEMM
            # instance writing stacked grads, and the optimizer sees one
            # [depth, ...] leaf per weight instead of `depth` separate
            # ones (see PaSSTConfig.blocks_impl). RNG streams are split
            # per scan step, so dropout draws differ from the loop form
            # (same distribution; production recipes train at drop 0).
            step_cls = nn.remat(_BlockScanStep) if cfg.remat else _BlockScanStep
            scanned = nn.scan(
                step_cls,
                variable_axes={"params": 0},
                split_rngs={
                    "params": True, "dropout": True,
                    "droppath": True, "patchout": True,
                },
                length=cfg.depth,
            )(
                d, cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias,
                cfg.drop_rate, cfg.attn_drop_rate, dtype=dtype, train=train,
                softmax_fp32=cfg.softmax_fp32, plus1=cfg.plus1_attn,
                gelu_approximate=cfg.gelu_approximate,
                gelu_saved_deriv=cfg.gelu_saved_deriv,
                fused_attn=cfg.use_fused_attn, fused_ln=cfg.use_fused_ln,
                fuse_ln_qkv=cfg.fuse_ln_qkv,
                name="blocks",
            )
            x, _ = scanned(x, None)
        else:
            # Stochastic-depth decay rule (reference passt.py:444).
            dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
            # On TPU the training step is HBM-bandwidth-bound; remat trades
            # (cheap) recompute for not saving per-block activations.
            block_cls = nn.remat(Block, static_argnums=(2,)) if cfg.remat else Block
            for i in range(cfg.depth):
                x = block_cls(
                    d, cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias,
                    cfg.drop_rate, cfg.attn_drop_rate, float(dpr[i]),
                    dtype=dtype, softmax_fp32=cfg.softmax_fp32,
                    plus1=cfg.plus1_attn, gelu_approximate=cfg.gelu_approximate,
                    gelu_saved_deriv=cfg.gelu_saved_deriv,
                    fused_attn=cfg.use_fused_attn, fused_ln=cfg.use_fused_ln,
                    fuse_ln_qkv=cfg.fuse_ln_qkv,
                    name=f"blocks_{i}",
                )(x, train)

        x = _ln(cfg.use_fused_ln, "norm")(x)

        if cfg.distilled:
            features = (x[:, 0] + x[:, 1]) / 2.0  # (passt.py:582-583)
        else:
            features = x[:, 0]
        features = features.astype(jnp.float32)
        if cfg.representation_size and not cfg.distilled:
            # pre-logits representation layer (passt.py:452-458).
            features = jnp.tanh(
                nn.Dense(
                    cfg.representation_size, dtype=jnp.float32,
                    kernel_init=nn.initializers.lecun_normal(), name="pre_logits",
                )(features)
            )

        # head = LayerNorm -> Linear (reference passt.py:463-464; torch names
        # head.0 / head.1 map to head_norm / head_linear here).
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="head_norm")(features)
        logits = nn.Dense(
            cfg.num_classes, dtype=jnp.float32, kernel_init=trunc_normal_init(), name="head_linear"
        )(h)

        if cfg.distilled:
            # Defined for checkpoint parity; unused by the reference forward
            # (passt.py:582-588 applies only self.head) — XLA removes the
            # dead computation at compile time.
            _ = nn.Dense(
                cfg.num_classes, dtype=jnp.float32, kernel_init=trunc_normal_init(),
                name="head_dist",
            )(features)

        return logits, features


def init_passt(cfg: PaSSTConfig, rng: jax.Array, input_tdim: Optional[int] = None):
    """Initialize parameters; returns (model, params)."""
    model = PaSST(cfg)
    tdim = cfg.input_tdim if input_tdim is None else input_tdim
    x = jnp.zeros((1, cfg.in_chans, cfg.input_fdim, tdim), jnp.float32)
    variables = model.init({"params": rng}, x, train=False)
    return model, variables["params"]
