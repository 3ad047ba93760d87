"""AdamW with bf16 moment storage and a stochastic-rounded second moment.

The AdamW update is pure HBM bandwidth: at fp32 moments the step moves
28 B/param (read p,g,mu,nu + write p,mu,nu) — ~2.4 GB for PaSST-S's 86 M
params. Storing BOTH moments in bf16 cuts this to 20 B/param and halves
optimizer HBM residency (−688 MB for PaSST-S).

Numerics: optax's ``mu_dtype`` covers the first moment (its EMA increment,
1−beta1 = 0.1 of the running value, survives bf16's 8-bit mantissa). The
second moment does NOT: with beta2 = 0.999 the increment is ~1e-3 of the
running value — below bf16 resolution, so a nearest-rounded bf16 nu
simply stops updating and the effective LR drifts. ``nu`` is therefore
stored with **stochastic rounding** (add uniform-random low bits, then
truncate — unbiased by construction), implemented with pure-jnp bit
twiddling that XLA fuses straight into the update's elementwise loops.
All arithmetic is fp32 in-register; only the storage is bf16.

Why not a Pallas kernel: one was built and measured
(git history: ops/pallas/adamw.py) — numerically exact, but one
pallas_call per parameter leaf added ~3 ms of launch/copy overhead to the
33 ms train step (35.9 ms measured vs 33.0 baseline), swamping the ~0.8 ms
bandwidth saving. XLA already emits near-bandwidth-bound fused loops for
an elementwise optimizer; the win is the storage dtype, not the kernel.

Reference parity: the reference trains with torch AdamW at fp32 moments
(ex_audioset.py:97-109); this is a beyond-reference production knob
(``trainer.opt_moments_dtype="bfloat16_sr"``), oracle-tested against
optax.adamw and validated end-to-end by scripts/fullsize_train_demo.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    mu: optax.Params
    nu: optax.Params


def _stochastic_round_bf16(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """fp32 -> bf16 with unbiased stochastic rounding (bit-level: add a
    uniform 16-bit value below the bf16 mantissa, truncate). NaN/inf pass
    through untouched.

    Random bits come from ``lax.rng_bit_generator`` (the hardware RNG on
    TPU) rather than threefry: the optimizer touches every parameter every
    step, and software counter-based bits are pure VPU overhead here. The
    bit stream is backend-dependent — fine for rounding noise (the EMA is
    unbiased for ANY uniform stream), not for reproducible model
    randomness."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    kd = jax.random.key_data(key) if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
    k4 = jnp.concatenate([kd.astype(jnp.uint32).reshape(-1)] * 2)[:4]
    r = jax.lax.rng_bit_generator(k4, x.shape, dtype=jnp.uint32)[1] & jnp.uint32(0xFFFF)
    t = (u + r) & jnp.uint32(0xFFFF0000)
    sr = jax.lax.bitcast_convert_type(t, jnp.float32)
    sr = jnp.where(jnp.isfinite(x), sr, x)
    return sr.astype(jnp.bfloat16)


def apply_updates_sr(params, updates, key: jax.Array):
    """``optax.apply_updates`` with **stochastic-rounded bf16 stores**.

    For bf16-stored parameter leaves the add runs in fp32 and the result is
    stochastically rounded back to bf16 — unbiased, so updates far below
    the bf16 ulp at weight scale (lr~2e-5 steps vs ulp(0.1)~4e-4) still
    move the weight in expectation instead of rounding to zero as a
    nearest-rounded ``p + u`` would. Non-bf16 leaves follow the exact
    optax.apply_updates semantics (add in update dtype, cast to p.dtype).

    This is the companion of bf16 parameter STORAGE
    (``trainer.param_dtype="bfloat16_sr"``): the whole chain — optimizer
    elementwise loops, this add, the SR bit-twiddle — fuses into one XLA
    loop per leaf, so the saving is pure HBM traffic (2 B/param instead of
    4 on every param touch: fwd read, bwd read, dW write, optimizer
    read/write). Measured on-chip A/B: scripts/ab_param_dtype.py.
    """
    leaves_p, treedef = jax.tree_util.tree_flatten(params)
    leaves_u = treedef.flatten_up_to(updates)
    out = []
    for i, (p, u) in enumerate(zip(leaves_p, leaves_u)):
        if p.dtype == jnp.bfloat16:
            s = p.astype(jnp.float32) + u.astype(jnp.float32)
            out.append(_stochastic_round_bf16(s, jax.random.fold_in(key, i)))
        else:
            out.append(jnp.asarray(p + u.astype(jnp.asarray(p).dtype), p.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def cast_params_storage(params, param_dtype):
    """Cast parameters to their STORAGE dtype.

    ``param_dtype="bfloat16_sr"`` stores matrix/embedding leaves (ndim>=2)
    in bf16; vectors (biases, LayerNorm scales — <1% of bytes, precision-
    critical) stay fp32. ``None``/``"float32"`` is the identity. The train
    step must then apply updates via :func:`apply_updates_sr`
    (``make_train_step(param_sr=True)``) — nearest-rounded bf16 applies
    LOSE the update (measured: scripts/ab_param_dtype.py 'bf16' arm).
    """
    if param_dtype in (None, "float32"):
        return params
    if param_dtype != "bfloat16_sr":
        raise ValueError(
            f"unknown param_dtype {param_dtype!r}; known: float32, bfloat16_sr"
        )

    def cast(keypath, p):
        # Under the stacked block layouts (blocks_impl="scan"/"stacked",
        # leaves at blocks/block/... with a leading [depth] axis) the
        # vector-vs-matrix distinction is the PER-BLOCK rank: a [12, 768]
        # LayerNorm scale is still a precision-critical vector, not a
        # matrix.
        keys = [str(getattr(k, "key", k)) for k in keypath]
        eff_ndim = p.ndim - (1 if keys[:2] == ["blocks", "block"] else 0)
        return p.astype(jnp.bfloat16) if eff_ndim >= 2 else p

    return jax.tree_util.tree_map_with_path(cast, params)


def adamw_bf16sr(
    learning_rate,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    sr_nu: bool = True,
    seed: int = 0,
) -> optax.GradientTransformationExtraArgs:
    """optax-compatible AdamW with bf16 mu and stochastically-rounded bf16
    nu (see module docstring). ``learning_rate`` may be a float or an
    optax schedule (evaluated at the pre-update count, the optax
    convention). Composes with optax.apply_updates / optax.MultiSteps."""
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, jnp.bfloat16)
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None, **extra_args):
        del extra_args  # GradientTransformationExtraArgs contract
        if params is None:
            raise ValueError("adamw_bf16sr requires params")
        count = state.count + 1
        lr = jnp.asarray(sched(state.count), jnp.float32)
        t = count.astype(jnp.float32)
        c1 = 1.0 - jnp.exp(t * jnp.log(jnp.float32(b1)))
        c2 = 1.0 - jnp.exp(t * jnp.log(jnp.float32(b2)))
        base_key = jax.random.fold_in(jax.random.PRNGKey(seed), count)

        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_g = treedef.flatten_up_to(grads)
        leaves_mu = treedef.flatten_up_to(state.mu)
        leaves_nu = treedef.flatten_up_to(state.nu)
        upd, new_mu, new_nu = [], [], []
        for i, (p, g, mu, nu) in enumerate(
            zip(leaves_p, leaves_g, leaves_mu, leaves_nu)
        ):
            g32 = g.astype(jnp.float32)
            m = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
            v = b2 * nu.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            step = (m / c1) / (jnp.sqrt(v / c2) + eps) + weight_decay * p.astype(
                jnp.float32
            )
            # fp32 updates for bf16-stored leaves: casting the ~2e-5-scale
            # update to bf16 here would nearest-round it BEFORE
            # apply_updates_sr's fp32 add + stochastic store, partially
            # defeating the unbiased-SR design (round-5 review finding).
            # fp32 leaves are unchanged (astype is the identity there).
            upd.append(
                -lr * step
                if p.dtype == jnp.bfloat16
                else (-lr * step).astype(p.dtype)
            )
            new_mu.append(m.astype(jnp.bfloat16))
            if sr_nu:
                new_nu.append(
                    _stochastic_round_bf16(v, jax.random.fold_in(base_key, i))
                )
            else:
                new_nu.append(v.astype(jnp.bfloat16))
        return (
            jax.tree_util.tree_unflatten(treedef, upd),
            FusedAdamWState(
                count=count,
                mu=jax.tree_util.tree_unflatten(treedef, new_mu),
                nu=jax.tree_util.tree_unflatten(treedef, new_nu),
            ),
        )

    return optax.GradientTransformationExtraArgs(init, update)
