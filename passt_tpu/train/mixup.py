"""Batch mixup, fully on device.

The reference draws a batch permutation and per-sample
``lambda = max(Beta(a, a), 1 - Beta(a, a))`` on the host and blends the
*spectrograms* and targets (reference: helpers/mixup.py:5-12, applied at
ex_audioset.py:172-183). Here both draws come from a JAX PRNG key inside the
jitted train step — no host round trip, reproducible from the step key.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_mixup(rng: jax.Array, batch_size: int, alpha: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (permutation [B], lambda [B]) with lambda >= 0.5."""
    k1, k2 = jax.random.split(rng)
    perm = jax.random.permutation(k1, batch_size)
    lam = jax.random.beta(k2, alpha, alpha, (batch_size,))
    lam = jnp.maximum(lam, 1.0 - lam)
    return perm, lam.astype(jnp.float32)


def apply_mixup(x: jnp.ndarray, perm: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Blend ``x`` with its permuted batch: ``lam * x + (1-lam) * x[perm]``.
    ``lam`` broadcasts over all non-batch axes."""
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    lam = lam.reshape(shape)
    return x * lam + jnp.take(x, perm, axis=0) * (1.0 - lam)
