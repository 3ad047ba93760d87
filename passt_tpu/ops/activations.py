"""Activation kernels with backward-pass cost engineered for TPU.

``tanh_gelu``: the tanh-approximate GELU with a custom VJP that saves the
DERIVATIVE instead of the pre-activation. Rationale (measured, PARITY.md
"kernel-by-kernel" table): under standard AD the backward pass recomputes
``tanh`` from the saved pre-activation — 1.87 ms/step of VPU
transcendentals at PaSST-S/B=12 (MLP grad 0.714 vs 0.558 ms/block
without GELU). But ``gelu'(x)`` shares the same ``tanh(u)`` the forward
already computes, so evaluating it in the forward epilogue costs only a
few FMAs (hidden under the MXU matmul it fuses into), and the residual it
saves (``d = gelu'(x)``, same shape/dtype as the pre-activation AD would
have saved) carries identical HBM traffic. The backward collapses to one
elementwise multiply with zero transcendentals.

Numerics: identical forward values to ``jax.nn.gelu(x, approximate=True)``
(same formula, same dtype discipline); the VJP is the analytic derivative
of that same formula evaluated in fp32 and cast to the residual dtype —
bit-comparable to AD up to one rounding of the saved residual.

Reference activation: torch ``nn.GELU`` inside ``Mlp`` (reference
models/passt.py:271-290); the erf→tanh swap itself is quality-validated
separately (PaSSTConfig.gelu, PARITY.md GELU finding).
"""

import math

import jax
import jax.numpy as jnp

_C = math.sqrt(2.0 / math.pi)
_A = 0.044715


@jax.custom_vjp
def tanh_gelu(x):
    """tanh-approximate GELU, backward free of transcendentals."""
    return _fwd_value(x)


def _fwd_value(x):
    xf = x.astype(jnp.float32)
    t = jnp.tanh(_C * (xf + _A * xf * xf * xf))
    return (0.5 * xf * (1.0 + t)).astype(x.dtype)


def _fwd(x):
    xf = x.astype(jnp.float32)
    u = _C * (xf + _A * xf * xf * xf)
    t = jnp.tanh(u)
    h = 0.5 * xf * (1.0 + t)
    # d/dx [0.5 x (1+tanh(u))] = 0.5(1+t) + 0.5 x (1-t^2) u'(x);
    # u'(x) = c (1 + 3a x^2). Shares t with the forward value — no new
    # transcendentals.
    d = 0.5 * (1.0 + t) + 0.5 * xf * (1.0 - t * t) * _C * (1.0 + 3.0 * _A * xf * xf)
    return h.astype(x.dtype), d.astype(x.dtype)


def _bwd(d, g):
    return ((g.astype(jnp.float32) * d.astype(jnp.float32)).astype(d.dtype),)


tanh_gelu.defvjp(_fwd, _bwd)
