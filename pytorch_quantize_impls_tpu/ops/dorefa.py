"""DoReFa-Net k-bit weight / activation / gradient quantization.

Reference: ``QuantTorch/functions/dorefa_connect.py`` (SURVEY.md §2-L0).
Paper: DoReFa-Net (arXiv:1606.06160) — the paper math is the behavioral spec:

* ``quantize_k(x, k) = round((2^k - 1) * x) / (2^k - 1)`` with identity STE
  over the rounding (eq. 5); defined on x in [0, 1].
* Weights (eq. 9): ``W_q = 2 * quantize_k( tanh(W) / (2 max|tanh(W)|) + 1/2, k) - 1``
  so ``W_q in [-1, 1]``; the gradient flows through tanh and the max-normalizer
  (only the round is STE'd). ``k == 1`` degenerates to ``E(|W|) * sign(W)`` (eq. 8).
* Activations (eq. 10): ``quantize_k(clip(x, 0, 1), k)``.
* Gradients (eq. 12, train-time, optional): stochastically quantize the
  *backward* signal: ``g_q = 2 M [ quantize_k( g/(2M) + 1/2 + N(k), k ) - 1/2 - N(k)~ ]``
  with ``M = max|g|`` and noise ``N(k) = (U - 1/2) / (2^k - 1)``.

API quirk kept for parity: the reference consistently spells the bit-width
parameter ``bitwight`` (SURVEY.md §2-L0) — our keyword is ``bits`` but the
layer API accepts ``bitwight=`` as an alias.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from pytorch_quantize_impls_tpu.ops.common import Array, round_ste, safe_sign


def quantize_k(x: Array, bits: int) -> Array:
    """Uniform k-bit quantizer on [0, 1] with identity STE over the round."""
    if bits >= 32:
        return x
    n = float(2**bits - 1)
    return round_ste(x * n) / n


def dorefa_weight(w: Array, bits: int) -> Array:
    """DoReFa weight quantization (paper eq. 8/9); output in [-1, 1]."""
    if bits == 1:
        # eq. 8: E(|W|) * sign(W); E over the whole tensor, STE on sign only.
        scale = jnp.mean(jnp.abs(w))
        return scale * _sign_ste(w)
    if bits >= 32:
        return w
    t = jnp.tanh(w)
    # all-zero weights would divide 0/0 -> NaN (forward AND cotangent);
    # where-guard keeps both finite (grad flows only through the live branch)
    m = jnp.max(jnp.abs(t))
    t = t / (2.0 * jnp.where(m > 0, m, 1.0)) + 0.5
    return 2.0 * quantize_k(t, bits) - 1.0


_sign_ste = None  # set below


def _make_sign_ste():
    @jax.custom_vjp
    def f(x):
        return safe_sign(x)

    f.defvjp(lambda x: (safe_sign(x), None), lambda _, g: (g,))
    return f


_sign_ste = _make_sign_ste()


def dorefa_activation(x: Array, bits: int) -> Array:
    """DoReFa activation quantization (paper eq. 10): k-bit grid on clip(x,0,1).

    The clip is differentiated exactly (zero gradient outside [0, 1]); only
    the round is STE'd — matches the reference placing this after the
    nonlinearity (SURVEY.md §2-L1 "DoReFa layers").
    """
    if bits >= 32:
        return x
    return quantize_k(jnp.clip(x, 0.0, 1.0), bits)


@jax.custom_vjp
def _dorefa_grad_prim(x: Array, u: Array, n_levels: Array) -> Array:
    return x


def _dorefa_grad_fwd(x, u, n_levels):
    return x, (u, n_levels)


def _dorefa_grad_bwd(res, g):
    u, n_levels = res
    m = jnp.max(jnp.abs(g))
    m = jnp.where(m == 0, jnp.ones_like(m), m)
    noise = (u - 0.5) / n_levels
    gs = g / (2.0 * m) + 0.5 + noise
    q = jnp.round(jnp.clip(gs, 0.0, 1.0) * n_levels) / n_levels
    gq = 2.0 * m * (q - 0.5 - noise)
    return gq.astype(g.dtype), jnp.zeros_like(u), jnp.zeros_like(n_levels)


_dorefa_grad_prim.defvjp(_dorefa_grad_fwd, _dorefa_grad_bwd)


def dorefa_gradient(x: Array, key: jax.Array, bits: int) -> Array:
    """Identity forward; quantizes the *gradient* to k bits with stochastic
    noise in the backward pass (paper eq. 12). Insert on the activation path."""
    if bits >= 32:
        return x
    u = jax.random.uniform(key, jnp.shape(x), dtype=jnp.result_type(x, jnp.float32))
    n_levels = jnp.asarray(float(2**bits - 1), dtype=u.dtype)
    return _dorefa_grad_prim(x, u, n_levels)


def dorefa_quantizers(
    w_bits: int = 1, a_bits: int = 32, g_bits: int = 32
) -> Dict[str, Callable]:
    """Factory mirroring the reference's ``nnDorefaQuant(bitwight=k)`` style:
    returns the configured ``{'weight', 'activation', 'gradient'}`` callables."""
    return {
        "weight": lambda w: dorefa_weight(w, w_bits),
        "activation": lambda x: dorefa_activation(x, a_bits),
        "gradient": lambda x, key: dorefa_gradient(x, key, g_bits),
    }
