"""Elastic / loss-aware quantization penalties.

Reference: ``QuantTorch/functions/elastic_quant_connect.py`` (SURVEY.md §2-L0,
confidence MED/LOW on exact formulas): differentiable regularization losses
that pull full-precision weights toward the quantization grid — a W-shaped
penalty with zeros at each grid level — summed into the task loss instead of
(or in addition to) hard projection.

Behavioral realization here: for a grid ``G``, the penalty is the mean squared
distance to the nearest grid point, ``mean((w - nearest_G(w))^2)``, with the
projection treated as constant (so the gradient ``2 (w - nearest_G(w)) / n``
pulls each weight toward its nearest level — exactly the W-shape described in
the survey). Variants for the binary {-1,+1}, linear-FSR, and log (power-of-2)
grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_quantize_impls_tpu.ops.common import Array, safe_sign
from pytorch_quantize_impls_tpu.ops.log_lin import _log_quant_fwd_value


def _grid_penalty(w: Array, nearest: Array) -> Array:
    return jnp.mean(jnp.square(w - jax.lax.stop_gradient(nearest)))


def binary_elastic_loss(w: Array) -> Array:
    """Penalty with zeros at ±1: pulls weights toward the binary grid."""
    return _grid_penalty(w, safe_sign(w))


def lin_elastic_loss(w: Array, fsr: float = 0.0, bits: int = 4) -> Array:
    """Penalty toward the uniform FSR grid (step ``2^(fsr - bits)``)."""
    step = 2.0 ** (fsr - bits)
    bound = 2.0**fsr
    nearest = jnp.clip(jnp.round(w / step) * step, -bound, bound)
    return _grid_penalty(w, nearest)


def log_elastic_loss(w: Array, fsr: float = 0.0, bits: int = 4) -> Array:
    """Penalty toward the signed power-of-2 grid."""
    nearest = _log_quant_fwd_value(w, fsr, bits, with_sign=True)
    return _grid_penalty(w, nearest)
