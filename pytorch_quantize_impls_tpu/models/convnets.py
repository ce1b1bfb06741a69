"""XNOR-Net convnet and log-quant VGG-small for CIFAR-10
(BASELINE configs 3 and 5).

``XNORConvNet``: VGG-ish stack of XNOR convs (per-out-channel alpha, binary
weights; hidden convs also binarize inputs — full XNOR mode, arXiv:1603.05279).
``LogQuantVGGSmall``: VGG-small with power-of-2 weights (arXiv:1603.01025),
lowered to shift-based matmul at inference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as fnn

from pytorch_quantize_impls_tpu import nn as qnn


class XNORConvNet(fnn.Module):
    """BASELINE config 3: XNOR conv net with per-channel alpha, CIFAR-10."""

    classes: int = 10
    widths: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    quantized: bool = True
    # False = Binary-Weight-Network mode (XNOR paper §3.1: alpha-scaled
    # binary weights, real-valued activations) — near-lossless, vs the
    # full-XNOR mode whose input binarization trades accuracy for speed.
    binarize_inputs: bool = True
    # Keep the first conv and the classifier head full-precision (the
    # standard first/last-layer rule every binarization paper applies —
    # XNOR-Net §4, BinaryConnect, DoReFa all exempt them; the first conv's
    # cin is tiny so its binary capacity collapses, e.g. 9 sign weights
    # for a 3x3x1 filter). Default False to stay the fully-quantized
    # BASELINE config; the real-data accuracy anchor turns it on.
    fp32_first_last: bool = False
    # Full-XNOR input scale map K (paper §3.2). The fused int8-chained
    # serving path (infer/fused_chain.py) requires K off: K depends on the
    # real-valued input magnitudes, which the int8 code chain never
    # materializes. (The XNOR paper itself notes K can be dropped at
    # inference with small loss.)
    use_input_scale_map: bool = True
    # Mixed-precision compute dtype (fp32 masters untouched).
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        for i, w in enumerate(self.widths):
            # first conv sees real pixels in either mode
            binarize_input = self.binarize_inputs and i > 0
            if self.quantized and not (self.fp32_first_last and i == 0):
                x = qnn.XNORConv(
                    features=w,
                    kernel_size=(3, 3),
                    binarize_input=binarize_input,
                    use_input_scale_map=self.use_input_scale_map,
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(x, train=train)
            else:
                x = fnn.Conv(
                    features=w, kernel_size=(3, 3), use_bias=False,
                    dtype=self.dtype, name=f"conv{i}"
                )(x)
            x = fnn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name=f"bn{i}"
            )(x)
            if i % 2 == 1:
                x = fnn.max_pool(x, (2, 2), strides=(2, 2))
            # Nonlinearity rule: in full-XNOR mode the NEXT layer's input
            # binarization (sign) IS the nonlinearity — inserting relu first
            # would make every binarized activation +1. In BWN mode
            # (binarize_inputs=False) and in the fp32 twin, conv+BN stages
            # would otherwise compose linearly, so relu is required
            # (reference BWN topologies keep it — ADVICE r3).
            if not (self.quantized and self.binarize_inputs):
                x = fnn.relu(x)
        x = x.reshape((x.shape[0], -1))
        if self.quantized and not self.fp32_first_last:
            x = qnn.XNORLinear(
                features=self.classes, dtype=self.dtype, name="head"
            )(x, train=train)
        else:
            x = fnn.Dense(features=self.classes, dtype=self.dtype, name="head")(x)
        return x


class LogQuantVGGSmall(fnn.Module):
    """BASELINE config 5: power-of-2 weight VGG-small, CIFAR-10.

    fsr=1 weights (domain ±2) with ``bits``-bit exponents; activations stay
    fp (weights-only quantization, as in the log-quant paper's CIFAR runs).
    """

    classes: int = 10
    widths: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    bits: int = 4
    fsr: float = 1.0
    quantized: bool = True
    # Mixed-precision compute dtype (fp32 masters untouched).
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        for i, w in enumerate(self.widths):
            if self.quantized:
                x = qnn.ConvQuantLog(
                    features=w,
                    kernel_size=(3, 3),
                    fsr=self.fsr,
                    bits=self.bits,
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(x, train=train)
            else:
                x = fnn.Conv(
                    features=w, kernel_size=(3, 3), use_bias=False,
                    dtype=self.dtype, name=f"conv{i}"
                )(x)
            x = fnn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name=f"bn{i}"
            )(x)
            x = fnn.relu(x)
            if i % 2 == 1:
                x = fnn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        if self.quantized:
            x = qnn.LinearQuantLog(
                features=self.classes, fsr=self.fsr, bits=self.bits,
                dtype=self.dtype, name="head"
            )(x, train=train)
        else:
            x = fnn.Dense(features=self.classes, dtype=self.dtype, name="head")(x)
        return x
