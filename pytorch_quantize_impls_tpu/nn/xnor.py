"""XNOR-Net layers (reference: ``QuantTorch/layers/xnor_layers.py`` —
SURVEY.md §2-L1, §3.4; paper arXiv:1603.05279).

Per forward: recompute ``α_c = mean|W_c|`` from the *current* fp32 master
weights, binarize, scale the output by α (broadcast over out-channel); in
full mode also binarize the input and multiply by the ``K`` scale map.
α stays differentiable (the gradient includes the 1/n term — SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from pytorch_quantize_impls_tpu import ops
from pytorch_quantize_impls_tpu.nn.base import QuantConv, QuantDense


class XNORLinear(nn.Module):
    """Dense layer with ``α_c · sign(W)`` weights (α per out-feature)."""

    features: int
    binarize_input: bool = False
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return QuantDense(
            features=self.features,
            # sign weights + α on the OUTPUT (reference §3.4 order): keeps
            # the matmul integer-exact == bit-identical to the packed kernel
            # epilogue (see QuantDense.out_scale). The sign carries the
            # clipped STE so master kernels can flip signs during training
            # (α's mean(|w|) gradient alone is parallel to sign(w)).
            weight_quant=ops.sign_ste_clip,
            out_scale=lambda w: jnp.mean(jnp.abs(w), axis=0),
            input_quant=ops.binary_tanh if self.binarize_input else None,
            use_bias=self.use_bias,
            dtype=self.dtype,
            scheme="xnor",
            a_bits=1 if self.binarize_input else 0,
            name="dense",
        )(x, train=train)


class XNORConv(nn.Module):
    """Conv layer with per-out-channel α scaling; ``binarize_input=True``
    enables full-XNOR mode with the K input-scale map (paper §3.2)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    binarize_input: bool = False
    use_input_scale_map: bool = True
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        k_map = None
        if self.binarize_input and self.use_input_scale_map:
            k_map = ops.xnor_input_scale_map(x, self.kernel_size)
            if self.strides != (1, 1):
                k_map = k_map[:, :: self.strides[0], :: self.strides[1], :]
        y = QuantConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            # HWIO kernel: out-channel is the last axis. Sign weights + α on
            # the OUTPUT (reference §3.4 order; see QuantDense.out_scale);
            # clipped STE on the sign so kernel signs remain trainable.
            weight_quant=ops.sign_ste_clip,
            out_scale=lambda w: jnp.mean(jnp.abs(w), axis=(0, 1, 2)),
            input_quant=ops.binary_tanh if self.binarize_input else None,
            use_bias=self.use_bias,
            dtype=self.dtype,
            scheme="xnor",
            a_bits=1 if self.binarize_input else 0,
            name="conv",
        )(x, train=train)
        if k_map is not None and self.padding == "SAME":
            y = y * k_map.astype(y.dtype)  # keep compute dtype (bf16 path)
        return y
