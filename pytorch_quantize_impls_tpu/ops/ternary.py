"""TernaryConnect: quantize weights to {-1, 0, +1}.

Reference: ``QuantTorch/functions/terner_connect.py`` (SURVEY.md §2-L0;
the reference keeps the French-flavored "terner" spelling — we use "ternary"
but alias the module name in tests for parity). Paper: TernaryConnect
(arXiv:1510.03009, Lin et al.).

Deterministic: round to the nearest of {-1, 0, +1} (thresholds at ±0.5).
Stochastic (paper §2.2): for ``w >= 0``, ``P(+1) = w`` else 0; for ``w < 0``,
``P(-1) = -w``; remaining mass on 0 — with ``w`` pre-clipped to [-1, 1].
Backward: STE (clipped by default), sample treated as constant.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from pytorch_quantize_impls_tpu.ops import common
from pytorch_quantize_impls_tpu.ops.common import Array, resolve_ste_mask, ste


def _ternary_round(x: Array) -> Array:
    return jnp.round(jnp.clip(x, -1.0, 1.0))


def ternary_connect_det(
    x: Array,
    *,
    ste_mode: Union[str, Callable[[Array], Array]] = common.STE_CLIP,
) -> Array:
    """Deterministic ternarization: nearest of {-1, 0, +1}."""
    return ste(_ternary_round, resolve_ste_mask(ste_mode))(x)


@jax.custom_vjp
def _ternary_stoch_prim(x: Array, u: Array) -> Array:
    w = jnp.clip(x, -1.0, 1.0)
    hit = u < jnp.abs(w)  # sample the non-zero level with prob |w|
    return jnp.where(hit, jnp.sign(w), 0.0).astype(x.dtype)


def _ternary_stoch_fwd(x, u):
    return _ternary_stoch_prim(x, u), x


def _ternary_stoch_bwd(x, g):
    return g * (jnp.abs(x) <= 1.0).astype(g.dtype), jnp.zeros_like(x)


_ternary_stoch_prim.defvjp(_ternary_stoch_fwd, _ternary_stoch_bwd)


def ternary_connect_stoch(x: Array, key: jax.Array) -> Array:
    """Stochastic ternarization (two-sided Bernoulli, see module docstring)."""
    u = jax.random.uniform(key, jnp.shape(x), dtype=jnp.result_type(x, jnp.float32))
    return _ternary_stoch_prim(x, u.astype(jnp.asarray(x).dtype))


def ternary_connect(deterministic: bool = True) -> Callable[..., Array]:
    """Factory: returns the configured det/stoch ternarizer."""
    if deterministic:
        return ternary_connect_det
    return ternary_connect_stoch
