"""LayerNorm with a one-pass Pallas TPU backward.

Motivation (measured, scripts/ln_fusion_probe.py on the real chip): the
in-graph marginal cost of a pre-norm LayerNorm feeding its matmul is
0.0196 ms forward but **0.148 ms backward** per site at flagship block
shapes ([12, 474, 768]) — ~5x the ~0.03 ms HBM floor (read x + read dy +
write dx). XLA lowers LN-backward as several fp32 reduction passes with
materialized intermediates, and making the LN bf16 was A/B'd NEUTRAL
(round 1) — the cost is pass-structure, not bytes, which is exactly what
a fused single-pass kernel fixes.

Outcome (measured, scripts/ab_step_combos.py gelu vs ln, real chip,
same session): standalone the one-pass backward beats XLA's, but the
FULL train step REGRESSES 31.54 -> 33.62 ms with it enabled — the
custom_vjp boundary stops XLA from fusing the LN forward/backward into
the adjacent qkv/proj matmul gradients (the same fusion that absorbed
most of the fused-attention win), and that lost fusion costs more than
the pass-structure win reclaims. Status: measured DEAD END for training;
``ln_impl="fused"`` stays as an explicit opt-in (exercised under GSPMD
in dryrun_multichip and test_parallel), ``"auto"`` resolves to XLA.

The kernel computes, per row tile, in one read of (x, dy):

  x_hat  = (x - mu) * rstd                       (saved mu/rstd, no recompute)
  g      = dy * scale
  dx     = rstd * (g - mean(g) - x_hat * mean(g * x_hat))
  dscale += sum_rows(dy * x_hat),   dbias += sum_rows(dy)

dscale/dbias are written as per-program partials [G, D] and summed
outside (G = row-tiles, tiny). The forward stays in XLA (its marginal
cost is already near-floor) and saves (x, mu, rstd) — the same residuals
standard AD keeps, so HBM residual traffic is unchanged.

Numerics: statistics use flax's ``var = max(E[x^2] - mu^2, 0)``
formulation in fp32; forward output is fp32 (``nn.LayerNorm
(dtype=float32)`` semantics — callers cast after, as before). The
backward formula is the analytic LN gradient evaluated in fp32; dx is
cast to the input dtype.

Reference: torch ``nn.LayerNorm(eps=1e-6)`` inside every pre-norm block
(reference models/passt.py:379-386); this is purely an implementation
reformulation — parameters, eps and semantics are unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 512  # row tile; [TM, D] fp32 intermediates stay well under VMEM


def _bwd_kernel(x_ref, dy_ref, mu_ref, rstd_ref, scale_ref, dx_ref, dsc_ref, dbi_ref, *, m_total):
    pid = pl.program_id(0)
    tm = x_ref.shape[0]
    x = x_ref[...].astype(jnp.float32)  # [TM, D]
    dy = dy_ref[...].astype(jnp.float32)
    mu = mu_ref[...].astype(jnp.float32)  # [TM, 1]
    rstd = rstd_ref[...].astype(jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)  # [1, D]

    # Rows past m_total are block padding: zero their contributions (the
    # padded reads are unspecified values; never let them touch the
    # cross-row dscale/dbias sums).
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0) + pid * tm
    valid = rows < m_total
    x_hat = jnp.where(valid, (x - mu) * rstd, 0.0)
    dy = jnp.where(valid, dy, 0.0)

    inv_d = jnp.float32(1.0 / x.shape[1])
    g = dy * scale
    m1 = jnp.sum(g, axis=1, keepdims=True) * inv_d
    m2 = jnp.sum(g * x_hat, axis=1, keepdims=True) * inv_d
    dx_ref[...] = (rstd * (g - m1 - x_hat * m2)).astype(dx_ref.dtype)
    dsc_ref[...] = jnp.sum(dy * x_hat, axis=0, keepdims=True)[None]
    dbi_ref[...] = jnp.sum(dy, axis=0, keepdims=True)[None]


def _bwd_pallas(x2, dy2, mu, rstd, scale, interpret):
    m, d = x2.shape
    grid = (pl.cdiv(m, _TM),)
    row_spec = pl.BlockSpec((_TM, d), lambda i: (i, 0))
    stat_spec = pl.BlockSpec((_TM, 1), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0))
    # Partials are [G, 1, D] with block (1, 1, D): Mosaic requires the last
    # two block dims divisible by (8, 128) or equal to the array dims — a
    # flat [G, D] with block (1, D) violates the sublane rule.
    part_spec = pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0))
    dx, dsc_part, dbi_part = pl.pallas_call(
        functools.partial(_bwd_kernel, m_total=m),
        grid=grid,
        in_specs=[row_spec, row_spec, stat_spec, stat_spec, vec_spec],
        out_specs=(row_spec, part_spec, part_spec),
        out_shape=(
            jax.ShapeDtypeStruct((m, d), x2.dtype),
            jax.ShapeDtypeStruct((grid[0], 1, d), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], 1, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=10 * m * d,
            bytes_accessed=(2 * m * d * x2.dtype.itemsize) + 4 * m * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, dy2, mu, rstd, scale)
    return dx, dsc_part.sum(axis=(0, 1)), dbi_part.sum(axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln(x, scale, bias, eps, interpret):
    return _ln_fwd(x, scale, bias, eps, interpret)[0]


def _ln_fwd(x, scale, bias, eps, interpret):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mu) * rstd * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y, (x, mu, rstd, scale)


def _ln_bwd(eps, interpret, res, dy):
    x, mu, rstd, scale = res
    d = x.shape[-1]
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    dx, dscale, dbias = _bwd_pallas(
        x.reshape(m, d),
        dy.reshape(m, d),
        mu.reshape(m, 1),
        rstd.reshape(m, 1),
        scale.astype(jnp.float32).reshape(1, d),
        interpret,
    )
    return dx.reshape(x.shape), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_ln.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-6,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """LayerNorm over the last axis, fp32 output, Pallas one-pass backward.

    Drop-in for ``nn.LayerNorm(epsilon=eps, dtype=float32)`` applied to
    ``[..., D]``: same statistics formulation, same fp32 output dtype;
    the backward runs as a single Pallas pass (see module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ln(x, scale, bias, float(eps), bool(interpret))
