"""BinaryConnect / BNN sign binarization.

Reference: ``QuantTorch/functions/binary_connect.py`` (SURVEY.md §2-L0) —
``BinaryConnectDeterministic`` / ``BinaryConnectStochastic``
``torch.autograd.Function`` subclasses and the ``binary_connect`` factory.
Papers: BinaryConnect (arXiv:1511.00363), BinaryNet/BNN (arXiv:1602.02830).

JAX mapping (SURVEY.md §3.2): ``jax.custom_vjp`` STE primitives; the
stochastic variant threads an explicit PRNG key and treats the Bernoulli draw
as a constant in the backward pass.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from pytorch_quantize_impls_tpu.ops import common
from pytorch_quantize_impls_tpu.ops.common import (
    Array,
    hard_sigmoid,
    resolve_ste_mask,
    safe_sign,
    ste,
)


def binary_connect_det(
    x: Array,
    *,
    ste_mode: Union[str, Callable[[Array], Array]] = common.STE_CLIP,
    clip_bound: float = 1.0,
) -> Array:
    """Deterministic BinaryConnect: ``sign(x)`` with ``sign(0) -> +1``.

    Backward is the straight-through estimator. The canonical BinaryConnect
    variant cancels the gradient where ``|x| > 1`` (hard-tanh STE,
    ``ste_mode='clip'``, the default); ``ste_mode='identity'`` passes it
    through unchanged — the reference ships both (SURVEY.md §2-L0).
    """
    mask = resolve_ste_mask(ste_mode, clip_bound)
    return ste(safe_sign, mask)(x)


@partial(jax.custom_vjp, nondiff_argnums=())
def _binary_stoch_prim(x: Array, u: Array) -> Array:
    # +1 with probability hard_sigmoid(x), else -1; u ~ U[0,1).
    return jnp.where(u < hard_sigmoid(x), 1.0, -1.0).astype(x.dtype)


def _binary_stoch_fwd(x, u):
    return _binary_stoch_prim(x, u), x


def _binary_stoch_bwd(x, g):
    # Clipped STE; the Bernoulli sample is a constant (zero cotangent for u).
    return g * (jnp.abs(x) <= 1.0).astype(g.dtype), jnp.zeros_like(x)


_binary_stoch_prim.defvjp(_binary_stoch_fwd, _binary_stoch_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def _binary_stoch_prim_identity(x: Array, u: Array) -> Array:
    return jnp.where(u < hard_sigmoid(x), 1.0, -1.0).astype(x.dtype)


_binary_stoch_prim_identity.defvjp(
    lambda x, u: (_binary_stoch_prim_identity(x, u), None),
    lambda _, g: (g, None),
)


def binary_connect_stoch(
    x: Array,
    key: jax.Array,
    *,
    ste_mode: str = common.STE_CLIP,
) -> Array:
    """Stochastic BinaryConnect.

    ``P(+1) = hard_sigmoid(x) = clip((x+1)/2, 0, 1)``, fresh Bernoulli draw per
    call (reference draws per forward; here the caller supplies ``key``).
    Backward is the same STE as the deterministic variant.
    """
    u = jax.random.uniform(key, jnp.shape(x), dtype=jnp.result_type(x, jnp.float32))
    u = u.astype(jnp.asarray(x).dtype)
    if ste_mode == common.STE_IDENTITY:
        return _binary_stoch_prim_identity(x, u)
    return _binary_stoch_prim(x, u)


def binary_tanh(x: Array) -> Array:
    """BNN activation binarization: ``sign(x)`` with hard-tanh STE.

    Used by "full binary" BNN layers on *activations* (SURVEY.md §2-L0
    "BNN activation binarization"); gradient is ``g * 1[|x| <= 1]``
    (arXiv:1602.02830 eq. 4).
    """
    return binary_connect_det(x, ste_mode=common.STE_CLIP)


def binary_connect(
    deterministic: bool = True,
    *,
    ste_mode: str = common.STE_CLIP,
) -> Callable[..., Array]:
    """Factory mirroring the reference's ``binary_connect(...)``: returns the
    configured det/stoch quantizer (stoch takes ``(x, key)``)."""
    if deterministic:
        return lambda x: binary_connect_det(x, ste_mode=ste_mode)
    return lambda x, key: binary_connect_stoch(x, key, ste_mode=ste_mode)
