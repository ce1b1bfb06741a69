"""DoReFa ResNet-20 for CIFAR-10 (BASELINE config 4: W4A4).

Standard CIFAR ResNet-20 (3 stages x 3 basic blocks, widths 16/32/64) with
DoReFa k-bit weight and activation quantization (arXiv:1606.06160). Following
DoReFa practice, the first conv and the final classifier stay full-precision;
activation quantization clips to [0, 1], so it follows BatchNorm -> ReLU.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.linen as fnn
import jax.numpy as jnp

from pytorch_quantize_impls_tpu import nn as qnn


class _BasicBlock(fnn.Module):
    features: int
    strides: int = 1
    w_bits: int = 4
    a_bits: int = 4
    a_quant: str = "fixed"  # "fixed" clip[0,1] | "pact" learnable clip
    quantized: bool = True
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        # Activation quantization placement (r4): quantize each conv's
        # INPUT (inside DorefaConv via a_bits) and keep the residual
        # stream full-precision — the standard quantized-ResNet topology
        # (PACT arXiv:1805.06085 §4, LQ-Nets practice). Quantizing AFTER
        # the residual add (the r3 layout) crushes the skip stream
        # through clip[0,1] at every block: the act codes are
        # NON-NEGATIVE, so additive junctions drift monotonically into
        # the zero-gradient saturation region with depth — measured
        # W32A4 0.38 vs W4A32 0.81 on the hardened gate at 600 steps;
        # the pre-conv placement recovers 0.66 at the same budget.
        def conv(f, s, name):
            if self.quantized:
                return partial(
                    qnn.DorefaConv(
                        features=f,
                        kernel_size=(3, 3),
                        strides=(s, s),
                        bits=self.w_bits,
                        a_bits=self.a_bits or None,
                        a_quant=self.a_quant,
                        use_bias=False,
                        dtype=self.dtype,
                        name=name,
                    ),
                    train=train,
                )
            return fnn.Conv(
                features=f, kernel_size=(3, 3), strides=(s, s), use_bias=False,
                dtype=self.dtype, name=name,
            )

        residual = x
        y = conv(self.features, self.strides, "conv1")(x)
        y = fnn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = fnn.relu(y)
        y = conv(self.features, 1, "conv2")(y)
        y = fnn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            # 1x1 projection shortcut (kept fp32 — negligible FLOPs)
            residual = fnn.Conv(
                features=self.features,
                kernel_size=(1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="proj",
            )(residual)
            residual = fnn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="bn_proj"
            )(residual)
        return fnn.relu(y + residual)


class DorefaResNet20(fnn.Module):
    classes: int = 10
    w_bits: int = 4
    a_bits: int = 4
    # Activation-quantizer flavor for the block convs: "fixed" DoReFa
    # clip[0,1] or "pact" learnable per-layer clip (arXiv:1805.06085) — the
    # standard W4A4 recipe; see ACCURACY.md dorefa rows.
    a_quant: str = "fixed"
    quantized: bool = True
    width: int = 16
    # Mixed-precision compute dtype (fp32 masters untouched).
    dtype: Optional[Any] = None
    # Rematerialize each residual block in backward (jax.checkpoint): trades
    # ~30% more FLOPs for O(depth) less activation HBM — the knob to flip
    # when batch x activations exceed HBM at scale.
    remat: bool = False

    @fnn.compact
    def __call__(self, x, train: bool = True):
        w = self.width
        # First conv full-precision (DoReFa practice)
        x = fnn.Conv(
            features=w, kernel_size=(3, 3), use_bias=False, dtype=self.dtype,
            name="stem",
        )(x)
        x = fnn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_stem")(x)
        x = fnn.relu(x)
        # (input quantization happens inside each block's convs — see
        # _BasicBlock; the residual stream itself stays full-precision)
        block_cls = (
            fnn.remat(_BasicBlock, static_argnums=(2,)) if self.remat
            else _BasicBlock
        )
        for stage, (f, s) in enumerate([(w, 1), (2 * w, 2), (4 * w, 2)]):
            for block in range(3):
                x = block_cls(
                    features=f,
                    strides=s if block == 0 else 1,
                    w_bits=self.w_bits,
                    a_bits=self.a_bits,
                    a_quant=self.a_quant,
                    quantized=self.quantized,
                    dtype=self.dtype,
                    name=f"stage{stage}_block{block}",
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        # Final classifier full-precision (DoReFa practice, arXiv:1606.06160):
        # the head's FLOPs are negligible, so run it in fp32 regardless of the
        # model compute dtype to avoid the one precision loss that can cost
        # measurable accuracy.
        return fnn.Dense(features=self.classes, dtype=jnp.float32, name="head")(
            x.astype(jnp.float32)
        )
