"""Log/linear FSR-quantized layers (reference:
``QuantTorch/layers/log_lin_layers.py`` — SURVEY.md §2-L1): dense/conv
wrappers taking ``fsr`` and ``bits`` (reference spelling ``bitwight``),
quantizing weights (and optionally activations) with LogQuant/LinQuant.

The log variants are the layers the inference engine lowers to shift-based
matmul (``kernels/shift_matmul.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn

from pytorch_quantize_impls_tpu import ops
from pytorch_quantize_impls_tpu.nn.base import QuantConv, QuantDense


class _LogLinBase(nn.Module):
    features: int
    fsr: float = 0.0
    bits: int = 4
    bitwight: Optional[int] = None
    quantize_input: bool = False
    lin_back: bool = True
    use_bias: bool = True
    dtype: Optional[Any] = None

    @property
    def w_bits(self) -> int:
        return self.bits if self.bitwight is None else self.bitwight


def _log_q(fsr, bits, lin_back):
    return partial(ops.log_quant, fsr=fsr, bits=bits, lin_back=lin_back)


def _lin_q(fsr, bits):
    return partial(ops.lin_quant, fsr=fsr, bits=bits)


class LinearQuantLog(_LogLinBase):
    """Dense layer with power-of-2 weights; clamp domain ±2^fsr."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        q = _log_q(self.fsr, self.w_bits, self.lin_back)
        return QuantDense(
            features=self.features,
            weight_quant=q,
            input_quant=q if self.quantize_input else None,
            use_bias=self.use_bias,
            clip_bound=2.0**self.fsr,
            dtype=self.dtype,
            scheme="log",
            w_bits=self.w_bits,
            a_bits=self.w_bits if self.quantize_input else 0,
            fsr=self.fsr,
            name="dense",
        )(x, train=train)


class LinearQuantLin(_LogLinBase):
    """Dense layer with uniform-FSR-grid weights."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        q = _lin_q(self.fsr, self.w_bits)
        return QuantDense(
            features=self.features,
            weight_quant=q,
            input_quant=q if self.quantize_input else None,
            use_bias=self.use_bias,
            clip_bound=2.0**self.fsr,
            dtype=self.dtype,
            scheme="lin",
            w_bits=self.w_bits,
            a_bits=self.w_bits if self.quantize_input else 0,
            fsr=self.fsr,
            name="dense",
        )(x, train=train)


class _LogLinConvBase(_LogLinBase):
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"


class ConvQuantLog(_LogLinConvBase):
    """Conv layer with power-of-2 weights."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        q = _log_q(self.fsr, self.w_bits, self.lin_back)
        return QuantConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            weight_quant=q,
            input_quant=q if self.quantize_input else None,
            use_bias=self.use_bias,
            clip_bound=2.0**self.fsr,
            dtype=self.dtype,
            scheme="log",
            w_bits=self.w_bits,
            a_bits=self.w_bits if self.quantize_input else 0,
            fsr=self.fsr,
            name="conv",
        )(x, train=train)


class ConvQuantLin(_LogLinConvBase):
    """Conv layer with uniform-FSR-grid weights."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        q = _lin_q(self.fsr, self.w_bits)
        return QuantConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            weight_quant=q,
            input_quant=q if self.quantize_input else None,
            use_bias=self.use_bias,
            clip_bound=2.0**self.fsr,
            dtype=self.dtype,
            scheme="lin",
            w_bits=self.w_bits,
            a_bits=self.w_bits if self.quantize_input else 0,
            fsr=self.fsr,
            name="conv",
        )(x, train=train)
