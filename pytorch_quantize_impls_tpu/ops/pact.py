"""PACT — Parameterized Clipping Activation (arXiv:1805.06085).

Extension beyond the reference scheme zoo (the paper is in the retrieved set,
``PAPERS.md``): activations are clipped to a LEARNABLE upper bound ``alpha``
and uniformly quantized to k bits over ``[0, alpha]``:

    y = round( clip(x, 0, α) · (2^k − 1) / α ) · α / (2^k − 1)

Gradients (paper §4, via STE over the round):

    ∂y/∂x = 1  on  0 < x < α,   0 elsewhere
    ∂y/∂α = 1  on  x ≥ α,       0 elsewhere   (so α learns the clip level)

The paper regularizes α with weight decay; ``pact_alpha_penalty`` provides
the L2 term to add to the loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_vjp
def _pact_prim(x: Array, alpha: Array, n: float) -> Array:
    a = jnp.maximum(alpha, 1e-8)
    y = jnp.clip(x, 0.0, a)
    return jnp.round(y * (n / a)) * (a / n)


def _pact_fwd(x, alpha, n):
    return _pact_prim(x, alpha, n), (x, alpha)


def _pact_bwd(res, g):
    x, alpha = res
    a = jnp.maximum(alpha, 1e-8)
    gx = g * jnp.where((x > 0) & (x < a), 1.0, 0.0)
    galpha = jnp.sum(g * jnp.where(x >= a, 1.0, 0.0)).reshape(jnp.shape(alpha))
    return gx, galpha.astype(jnp.asarray(alpha).dtype), None


_pact_prim.defvjp(_pact_fwd, _pact_bwd)


def pact(x: Array, alpha: Array, bits: int = 4) -> Array:
    """PACT-quantize activations to ``bits`` over the learnable ``[0, alpha]``."""
    if bits >= 32:
        return jnp.clip(x, 0.0, jnp.maximum(alpha, 1e-8))
    n = float(2**bits - 1)
    return _pact_prim(x, jnp.asarray(alpha, jnp.result_type(x, jnp.float32)), n)


def pact_alpha_penalty(alpha: Array) -> Array:
    """L2 regularizer on the clip level (paper: lambda * ||alpha||^2)."""
    return jnp.sum(jnp.square(alpha))
