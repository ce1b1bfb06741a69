"""Elastic-quantization layers (reference: ``QuantTorch/layers/elastic_layers.py``
— SURVEY.md §2-L1): full-precision layers that *sow* a grid penalty for their
weights into the ``'losses'`` collection, so the training loop sums it into
the task loss (instead of hard projection):

    out, aux = model.apply(params, x, mutable=['losses'])
    loss = task_loss + lam * nn.collect_elastic_losses(aux)

Grids: ``'binary'`` (±1), ``'lin'`` and ``'log'`` (FSR grids).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn

from pytorch_quantize_impls_tpu import ops


def _penalty(grid: str, w, fsr: float, bits: int):
    if grid == "binary":
        return ops.binary_elastic_loss(w)
    if grid == "lin":
        return ops.lin_elastic_loss(w, fsr=fsr, bits=bits)
    if grid == "log":
        return ops.log_elastic_loss(w, fsr=fsr, bits=bits)
    raise ValueError(f"unknown elastic grid {grid!r}")


class ElasticLinear(nn.Module):
    features: int
    grid: str = "binary"
    fsr: float = 0.0
    bits: int = 4
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        import jax.numpy as jnp

        kernel = self.param(
            "kernel",
            nn.initializers.glorot_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        cdt = self.dtype or x.dtype
        y = jnp.dot(x.astype(cdt), kernel.astype(cdt))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        self.sow("losses", "elastic", _penalty(self.grid, kernel, self.fsr, self.bits))
        return y


class ElasticConv(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    grid: str = "binary"
    fsr: float = 0.0
    bits: int = 4
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        import jax
        import jax.numpy as jnp

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        cdt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(cdt),
            kernel.astype(cdt),
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        self.sow("losses", "elastic", _penalty(self.grid, kernel, self.fsr, self.bits))
        return y
