"""DoReFa layers (reference: ``QuantTorch/layers/dorefa_layers.py`` —
SURVEY.md §2-L1): ``LinearDorefa(features, bitwight=k)`` / ``DorefaConv``.

Weight quantization happens per forward; activation quantization is exposed
both as the ``a_bits`` knob (applied to the layer input) and as the standalone
``ops.dorefa_activation`` for placement after nonlinearities, matching the
reference. The reference's ``bitwight`` spelling is accepted as an alias.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn

from pytorch_quantize_impls_tpu import ops
from pytorch_quantize_impls_tpu.nn.base import QuantConv, QuantDense
from pytorch_quantize_impls_tpu.nn.pact import PACT


class LinearDorefa(nn.Module):
    """Dense layer with DoReFa k-bit weights (and optional k-bit inputs)."""

    features: int
    bits: int = 4
    bitwight: Optional[int] = None  # reference-spelling alias for ``bits``
    a_bits: Optional[int] = None  # None -> no input quantization
    g_bits: Optional[int] = None  # None -> no gradient quantization
    # Input-quantizer flavor: "fixed" = DoReFa clip[0,1] (paper eq. 7);
    # "pact" = learnable per-layer clip bound (arXiv:1805.06085) — the
    # standard recipe for closing the W4A4 gap the fixed clip leaves.
    a_quant: str = "fixed"
    use_bias: bool = True
    dtype: Optional[Any] = None

    @property
    def w_bits(self) -> int:
        return self.bits if self.bitwight is None else self.bitwight

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.g_bits and train:
            # paper eq. 12: quantize the backward cotangent on the input
            # path (fresh noise per step via the 'quant' rng collection)
            x = ops.dorefa_gradient(x, self.make_rng("quant"), self.g_bits)
        pact_input = bool(self.a_bits) and self.a_quant == "pact"
        if pact_input:
            # PACT quantizes here in the wrapper (the learnable alpha lives
            # in this layer's scope); metadata a_bits=0 below so the packed
            # exporter treats inputs as real — the fixed-clip path stays the
            # packed/fused execution surface.
            x = PACT(bits=self.a_bits, name="act")(x, train=train)
        return QuantDense(
            features=self.features,
            weight_quant=partial(ops.dorefa_weight, bits=self.w_bits),
            input_quant=(
                partial(ops.dorefa_activation, bits=self.a_bits)
                if self.a_bits and not pact_input
                else None
            ),
            use_bias=self.use_bias,
            dtype=self.dtype,
            scheme="dorefa",
            w_bits=self.w_bits,
            a_bits=0 if pact_input else (self.a_bits or 0),
            name="dense",
        )(x, train=train)


class DorefaConv(nn.Module):
    """Conv layer with DoReFa k-bit weights (and optional k-bit inputs)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    bits: int = 4
    bitwight: Optional[int] = None
    a_bits: Optional[int] = None
    g_bits: Optional[int] = None
    a_quant: str = "fixed"  # "fixed" clip[0,1] | "pact" learnable clip
    use_bias: bool = True
    dtype: Optional[Any] = None

    @property
    def w_bits(self) -> int:
        return self.bits if self.bitwight is None else self.bitwight

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.g_bits and train:
            x = ops.dorefa_gradient(x, self.make_rng("quant"), self.g_bits)
        pact_input = bool(self.a_bits) and self.a_quant == "pact"
        if pact_input:
            x = PACT(bits=self.a_bits, name="act")(x, train=train)
        return QuantConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            weight_quant=partial(ops.dorefa_weight, bits=self.w_bits),
            input_quant=(
                partial(ops.dorefa_activation, bits=self.a_bits)
                if self.a_bits and not pact_input
                else None
            ),
            use_bias=self.use_bias,
            dtype=self.dtype,
            scheme="dorefa",
            w_bits=self.w_bits,
            a_bits=0 if pact_input else (self.a_bits or 0),
            name="conv",
        )(x, train=train)
