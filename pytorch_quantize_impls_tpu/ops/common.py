"""Shared quantizer helpers (reference: ``QuantTorch/functions/common.py``).

Behavioral spec per SURVEY.md §2-L0 "Common helpers": a zero-safe sign
(``sign(0) -> +1`` so binarized weights never hit 0), the BinaryConnect
hard-sigmoid, and the straight-through-estimator (STE) machinery that replaces
the reference's ``torch.autograd.Function`` subclasses with ``jax.custom_vjp``.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

Array = jax.Array

STE_IDENTITY = "identity"
STE_CLIP = "clip"


def safe_sign(x: Array) -> Array:
    """Sign with ``sign(0) == +1`` so binarized values are never 0.

    Reference: ``safeSign`` in ``QuantTorch/functions/common.py`` (SURVEY.md §2).
    """
    return jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))


def hard_sigmoid(x: Array) -> Array:
    """BinaryConnect hard sigmoid: ``clip((x + 1) / 2, 0, 1)``."""
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)


def ste(
    forward: Callable[[Array], Array],
    backward_mask: Optional[Callable[[Array], Array]] = None,
) -> Callable[[Array], Array]:
    """Build a straight-through-estimator quantizer.

    ``forward`` maps the full-precision tensor to its quantized twin.
    ``backward_mask(x)`` (optional) multiplies the upstream cotangent — e.g.
    the hard-tanh STE mask ``1[|x| <= 1]``. ``None`` means identity STE.

    This is the JAX-native equivalent of the reference's
    ``torch.autograd.Function`` pattern (forward + hand-written backward,
    SURVEY.md §3.2): ``jax.custom_vjp`` with the primal saved as residual.
    """

    @jax.custom_vjp
    def q(x):
        return forward(x)

    def q_fwd(x):
        return forward(x), x

    def q_bwd(x, g):
        if backward_mask is None:
            return (g,)
        return (g * backward_mask(x),)

    q.defvjp(q_fwd, q_bwd)
    return q


def clip_mask(bound: float = 1.0) -> Callable[[Array], Array]:
    """Hard-tanh STE mask: cancel gradient where ``|x| > bound``."""

    def mask(x: Array) -> Array:
        return (jnp.abs(x) <= bound).astype(x.dtype)

    return mask


def resolve_ste_mask(
    mode: Union[str, Callable[[Array], Array], None],
    clip_bound: float = 1.0,
) -> Optional[Callable[[Array], Array]]:
    """Map an STE mode name to a backward mask.

    The reference ships both identity-STE and clipped-STE variants of the
    binary quantizer (SURVEY.md §2-L0, confidence note); we expose both via
    ``ste='identity' | 'clip'`` (or a custom mask callable).
    """
    if mode is None or mode == STE_IDENTITY:
        return None
    if mode == STE_CLIP:
        return clip_mask(clip_bound)
    if callable(mode):
        return mode
    raise ValueError(f"unknown STE mode: {mode!r}")


def ste_identity(forward: Callable[[Array], Array]) -> Callable[[Array], Array]:
    """Identity-STE wrapper: gradient passes through unchanged."""
    return ste(forward, None)


def ste_clip(
    forward: Callable[[Array], Array], bound: float = 1.0
) -> Callable[[Array], Array]:
    """Clipped-STE wrapper: gradient cancelled where ``|x| > bound``."""
    return ste(forward, clip_mask(bound))


def round_ste(x: Array) -> Array:
    """``round`` with identity STE — the atom under DoReFa/linear/log grids."""
    return _round_ste(x)


_round_ste = ste_identity(jnp.round)
