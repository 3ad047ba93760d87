"""Training losses for the four recipes.

- AudioSet / FSD50K: multilabel BCE-with-logits against (optionally mixed)
  targets, mean-reduced (reference: ex_audioset.py:181-192;
  ex_fsd50k.py uses the identical form).
- ESC-50: single-label cross-entropy; under mixup the loss is the
  lambda-weighted sum of two CE terms against the two integer labels — NOT CE
  against blended one-hots (reference: ex_esc50.py:159-169).
- OpenMIC: targets are 20 labels + 20 observed-mask columns; BCE is
  multiplied by the mask before mean-reduction. The reference computes a
  mixed mask under mixup but applies the *un-mixed* mask
  (ex_openmic.py:172-177) — ``mix_masks=True`` opts into the OR-merged mask
  instead (arguably the intended behavior); default False for parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy with logits (numerically stable,
    the torch F.binary_cross_entropy_with_logits formulation)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample cross entropy for integer labels [B]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def multilabel_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,
    lam: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """AudioSet/FSD50K loss; when mixup (perm, lam) is given, targets are
    blended exactly as the reference (ex_audioset.py:182-186)."""
    if perm is not None:
        targets = targets * lam[:, None] + jnp.take(targets, perm, axis=0) * (1.0 - lam[:, None])
    return bce_with_logits(logits, targets).mean()


def single_label_mixup_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,
    lam: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ESC-50 loss (ex_esc50.py:159-169)."""
    if perm is None:
        return softmax_ce(logits, labels).mean()
    return (
        softmax_ce(logits, labels) * lam
        + softmax_ce(logits, jnp.take(labels, perm, axis=0)) * (1.0 - lam)
    ).mean()


def masked_bce_loss(
    logits: jnp.ndarray,
    targets_with_mask: jnp.ndarray,
    perm: Optional[jnp.ndarray] = None,
    lam: Optional[jnp.ndarray] = None,
    mix_masks: bool = False,
) -> jnp.ndarray:
    """OpenMIC loss: ``targets_with_mask`` is [B, 2K] = labels || mask
    (ex_openmic.py:155-184). Labels are binarized at 0.5 first."""
    k = targets_with_mask.shape[1] // 2
    mask = targets_with_mask[:, k:]
    y = (targets_with_mask[:, :k] > 0.5).astype(logits.dtype)
    if perm is not None:
        y = y * lam[:, None] + jnp.take(y, perm, axis=0) * (1.0 - lam[:, None])
        if mix_masks:
            mask = ((mask > 0.5) | (jnp.take(mask, perm, axis=0) > 0.5)).astype(logits.dtype)
    return (mask * bce_with_logits(logits, y)).mean()
