"""Stochastic weight averaging as a pure pytree running average.

The reference implements SWA as a 268-line Lightning callback cloning the
network and running-averaging its parameters every ``swa_freq`` epochs from
``swa_epoch_start`` (reference: helpers/swa_callback.py:161-268; defaults:
AudioSet start=50 freq=5 at ex_audioset.py:323, ESC-50 start=2 freq=1,
FSD50K start=10 freq=3). Functionally that is three lines of pytree math:
``avg += (p - avg) / (n + 1)`` on the epochs where an update fires
(swa_callback.py:246-268). Under replicated data-parallel params the
average is identical on every device — no callback machinery needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct


@struct.dataclass
class SWAState:
    avg_params: Any
    n_averaged: int = 0
    swa_epoch_start: int = struct.field(pytree_node=False, default=50)
    swa_freq: int = struct.field(pytree_node=False, default=5)


def swa_init(params, swa_epoch_start: int = 50, swa_freq: int = 5) -> SWAState:
    # Deep-copy the device buffers: the live params are donated (and their
    # buffers invalidated) by the next train step, so the average must not
    # alias them. The average is held in fp32 regardless of the params'
    # storage dtype: under trainer.param_dtype="bfloat16_sr" a bf16 running
    # average would stop moving once (p - avg)/(n+1) falls below the bf16
    # ulp at weight scale (n >~ 4 at lr-scale deltas).
    import jax.numpy as jnp

    return SWAState(
        avg_params=jax.tree.map(
            lambda x: jnp.array(x, dtype=jnp.float32, copy=True), params
        ),
        n_averaged=0,
        swa_epoch_start=swa_epoch_start,
        swa_freq=swa_freq,
    )


def swa_should_update(
    state: SWAState, epoch: int, max_epochs: Optional[int] = None
) -> bool:
    """True at END of 0-based ``epoch`` exactly when the reference callback
    averages at START of epoch ``epoch + 1`` (identical params: end of
    epoch e == start of epoch e+1).

    Reference semantics (swa_callback.py:128,131,194): ``swa_start =
    swa_epoch_start - 1`` (0-based), updates fire on train-epoch start
    while ``swa_start <= t <= max_epochs - 1``, every ``swa_freq`` epochs.
    The last trained epoch's params therefore never enter the average."""
    t = epoch + 1
    start = max(state.swa_epoch_start - 1, 0)
    if t < start:
        return False
    if max_epochs is not None and t > max_epochs - 1:
        return False
    return (t - start) % state.swa_freq == 0


def swa_update(state: SWAState, params) -> SWAState:
    """avg += (p - avg) / (n + 1)  (swa_callback.py:246-268)."""
    n = state.n_averaged

    def upd(avg, p):
        return avg + (p.astype(avg.dtype) - avg) / (n + 1.0)

    import jax.numpy as jnp

    if n == 0:
        new_avg = jax.tree.map(
            lambda a, p: jnp.array(p, dtype=a.dtype, copy=True),
            state.avg_params,
            params,
        )
    else:
        new_avg = jax.tree.map(upd, state.avg_params, params)
    return state.replace(avg_params=new_avg, n_averaged=n + 1)


def swa_step(
    state: SWAState, params, epoch: int, max_epochs: Optional[int] = None
) -> SWAState:
    """Convenience: update iff this epoch fires."""
    if swa_should_update(state, epoch, max_epochs):
        return swa_update(state, params)
    return state
