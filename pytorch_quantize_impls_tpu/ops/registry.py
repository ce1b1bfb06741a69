"""Generic quantizer dispatcher: scheme name + knobs -> configured callable.

The reference exposed per-scheme factory functions plus a generic ``Quant``
dispatcher (SURVEY.md §2 L0 "Linear (uniform) quantization" row); this is
the JAX equivalent, one string-keyed entry point over the whole zoo. The
returned callable maps ``(x)`` (deterministic schemes) or ``(x, key)``
(stochastic schemes) to the fake-quantized tensor with an STE backward.
"""

from __future__ import annotations

import functools
from typing import Callable

from pytorch_quantize_impls_tpu.ops import binary, dorefa, log_lin, ternary, xnor
from pytorch_quantize_impls_tpu.ops.common import Array

SCHEMES = (
    "binary",
    "binary_stoch",
    "binary_tanh",
    "ternary",
    "ternary_stoch",
    "dorefa_weight",
    "dorefa_activation",
    "log",
    "lin",
    "xnor",
)

STOCHASTIC_SCHEMES = ("binary_stoch", "ternary_stoch")


def get_quantizer(scheme: str, **knobs) -> Callable[..., Array]:
    """Build a quantizer callable from a scheme name and its knobs.

    Knob names follow the reference semantics: ``bits`` (a.k.a. the
    reference's ``bitwight``), ``fsr``, ``with_sign``, ``lin_back``,
    ``channel_axis``. Unknown knobs raise TypeError via the underlying op.

    >>> q = get_quantizer("dorefa_weight", bits=4)
    >>> wq = q(w)
    >>> q = get_quantizer("binary_stoch")
    >>> wq = q(w, key)       # stochastic schemes take an explicit PRNG key
    """
    if scheme == "binary":
        return functools.partial(binary.binary_connect_det, **knobs)
    if scheme == "binary_stoch":
        if knobs:
            raise TypeError(f"binary_stoch takes no knobs, got {knobs}")
        return binary.binary_connect_stoch
    if scheme == "binary_tanh":
        return functools.partial(binary.binary_tanh, **knobs)
    if scheme == "ternary":
        return functools.partial(ternary.ternary_connect_det, **knobs)
    if scheme == "ternary_stoch":
        if knobs:
            raise TypeError(f"ternary_stoch takes no knobs, got {knobs}")
        return ternary.ternary_connect_stoch
    if scheme == "dorefa_weight":
        return functools.partial(dorefa.dorefa_weight, **knobs)
    if scheme == "dorefa_activation":
        return functools.partial(dorefa.dorefa_activation, **knobs)
    if scheme == "log":
        return functools.partial(log_lin.log_quant, **knobs)
    if scheme == "lin":
        return functools.partial(log_lin.lin_quant, **knobs)
    if scheme == "xnor":
        ca = knobs.pop("channel_axis", -1)
        if knobs:
            raise TypeError(f"xnor knobs: channel_axis only, got {knobs}")

        def q(w):
            return xnor.xnor_quantize(w, ca) * xnor.xnor_alpha(w, ca)

        return q
    raise ValueError(f"unknown scheme {scheme!r}; pick from {SCHEMES}")
