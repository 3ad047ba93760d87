"""Fused Pallas AdamW with bf16 moment storage (TPU-native optimizer).

The AdamW update is pure HBM bandwidth: at fp32 moments the step moves
28 B/param (read p,g,mu,nu + write p,mu,nu) — ~2.4 GB for PaSST-S's 86 M
params, ~2.9 ms at v5e's 819 GB/s. Storing BOTH moments in bf16 cuts this
to 20 B/param (~2.1 ms) and halves optimizer HBM residency (−688 MB for
PaSST-S).

Why a kernel and not just optax dtypes: optax.adamw exposes ``mu_dtype``
only — and naively storing ``nu`` in bf16 is numerically WRONG: with
beta2=0.999 the EMA increment is ~1e-3 of the running value, below bf16's
8-bit mantissa resolution, so nu freezes and effective LR drifts. The
kernel stores nu with **stochastic rounding** (pltpu.stochastic_round,
per-step reseeded PRNG), making the EMA unbiased; mu's increments
(1-beta1 = 0.1) are representable, so deterministic rounding suffices.
All arithmetic is fp32 in-register; only storage is bf16.

One pallas_call per parameter leaf (the big matmul leaves dominate the
traffic; small leaves amortize inside the same launch pattern), flattened
to lane-tiled [rows, 128] with a one-row grid chunking, params/moments
updated in place via input_output_aliases.

Reference parity note: the reference trains with torch AdamW at fp32
moments (ex_audioset.py:97-109). This kernel is a beyond-reference
production knob (``trainer.opt_moments_dtype="bfloat16_sr"``), validated
in tests against an fp32 oracle and by the full-size from-scratch
training demo (scripts/fullsize_train_demo.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
_BLOCK_ROWS = 512  # 512x128 fp32 = 256 KB per operand block


def _pad_rows(n: int) -> int:
    rows = -(-n // _LANE)
    return -(-rows // _SUBLANE) * _SUBLANE


def _adamw_kernel(
    scal_ref,  # SMEM [6]: lr, b1, b2, eps, wd, step (fp32)
    seed_ref,  # SMEM [1]: int32 PRNG seed (per step)
    p_ref, g_ref, mu_ref, nu_ref,
    p_out, mu_out, nu_out,
    *, sr_nu: bool,
):
    lr, b1, b2, eps, wd, t = (scal_ref[i] for i in range(6))
    p = p_ref[...]
    g = g_ref[...].astype(jnp.float32)
    mu = mu_ref[...].astype(jnp.float32)
    nu = nu_ref[...].astype(jnp.float32)

    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * g * g
    # bias correction: 1 - beta^t with t >= 1
    c1 = 1.0 - jnp.exp(t * jnp.log(b1))
    c2 = 1.0 - jnp.exp(t * jnp.log(b2))
    mu_hat = mu / c1
    nu_hat = nu / c2
    update = mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p
    p_out[...] = p - lr * update

    if mu_out.dtype == jnp.bfloat16:
        mu_out[...] = mu.astype(jnp.bfloat16)
    else:
        mu_out[...] = mu
    if nu_out.dtype == jnp.bfloat16:
        if sr_nu:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            bits = pltpu.bitcast(pltpu.prng_random_bits(nu.shape), jnp.uint32)
            nu_out[...] = pltpu.stochastic_round(nu, bits, target_dtype=jnp.bfloat16)
        else:
            nu_out[...] = nu.astype(jnp.bfloat16)
    else:
        nu_out[...] = nu


def _leaf_update(p, g, mu, nu, scalars, seed, *, sr_nu: bool, interpret: bool):
    """One fused in-place AdamW step on a flattened leaf."""
    n = p.size
    rows = _pad_rows(n)
    pad = rows * _LANE - n

    def shape2d(x, dt):
        x = jnp.ravel(x).astype(dt) if x.dtype != dt else jnp.ravel(x)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(rows, _LANE)

    p2, g2 = shape2d(p, p.dtype), shape2d(g, jnp.float32)
    mu2, nu2 = shape2d(mu, mu.dtype), shape2d(nu, nu.dtype)

    block_rows = min(_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, block_rows),)
    vspec = pl.BlockSpec((block_rows, _LANE), lambda i: (i, 0))
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    # The Pallas interpreter has no TPU PRNG: CPU (test) runs fall back to
    # deterministic nu rounding; hardware SR is exercised on the real chip.
    p_new, mu_new, nu_new = pl.pallas_call(
        functools.partial(_adamw_kernel, sr_nu=sr_nu and not interpret),
        grid=grid,
        in_specs=[sspec, sspec, vspec, vspec, vspec, vspec],
        out_specs=(vspec, vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct(p2.shape, p2.dtype),
            jax.ShapeDtypeStruct(mu2.shape, mu2.dtype),
            jax.ShapeDtypeStruct(nu2.shape, nu2.dtype),
        ),
        input_output_aliases={2: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(scalars, seed, p2, g2, mu2, nu2)

    unshape = lambda x, like: x.reshape(-1)[:n].reshape(p.shape).astype(like.dtype)
    return unshape(p_new, p), unshape(mu_new, mu), unshape(nu_new, nu)


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    mu: optax.Params
    nu: optax.Params


def fused_adamw(
    learning_rate,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    moments_dtype=jnp.bfloat16,
    sr_nu: bool = True,
    seed: int = 0,
    interpret: Optional[bool] = None,
) -> optax.GradientTransformationExtraArgs:
    """optax-compatible fused AdamW (see module docstring).

    ``learning_rate`` may be a float or an optax schedule. Apply with
    ``optax.apply_updates(params, updates)`` where updates already contain
    the full new-minus-old delta (the transformation returns
    ``new_params - params`` so it composes exactly like optax.adamw)."""
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    mdt = jnp.dtype(moments_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, mdt)
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fused_adamw requires params")
        nonlocal interpret
        interp = (
            jax.default_backend() != "tpu" if interpret is None else interpret
        )
        count = state.count + 1
        lr = jnp.asarray(sched(state.count), jnp.float32)
        scalars = jnp.stack(
            [
                lr,
                jnp.float32(b1),
                jnp.float32(b2),
                jnp.float32(eps),
                jnp.float32(weight_decay),
                count.astype(jnp.float32),
            ]
        )
        base = jnp.asarray([seed], jnp.int32) + count * jnp.int32(2654435761 % (2**31))

        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_g = treedef.flatten_up_to(grads)
        leaves_mu = treedef.flatten_up_to(state.mu)
        leaves_nu = treedef.flatten_up_to(state.nu)
        new_p, new_mu, new_nu = [], [], []
        for i, (p, g, mu, nu) in enumerate(
            zip(leaves_p, leaves_g, leaves_mu, leaves_nu)
        ):
            pn, mun, nun = _leaf_update(
                p, g, mu, nu, scalars, base + jnp.int32(i * 7919),
                sr_nu=sr_nu, interpret=interp,
            )
            new_p.append(pn)
            new_mu.append(mun)
            new_nu.append(nun)
        updates = jax.tree_util.tree_unflatten(
            treedef, [pn - p for pn, p in zip(new_p, leaves_p)]
        )
        new_state = FusedAdamWState(
            count=count,
            mu=jax.tree_util.tree_unflatten(treedef, new_mu),
            nu=jax.tree_util.tree_unflatten(treedef, new_nu),
        )
        return updates, new_state

    return optax.GradientTransformationExtraArgs(init, update)
