"""TernaryConnect layers (reference: ``QuantTorch/layers/terner_layers.py`` —
SURVEY.md §2-L1): the binary-layer pattern over the {-1, 0, +1} quantizer."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn

from pytorch_quantize_impls_tpu import ops
from pytorch_quantize_impls_tpu.nn.base import QuantConv, QuantDense, stochastic


def ternary_spread_init(key, shape, dtype=None):
    """Uniform(-1, 1) master-weight init — the TernaryConnect paper's weight
    domain (arXiv:1510.03009 clips masters to [-1, 1]).

    Fan-in-scaled inits (glorot std ~0.06 at width 512) put EVERY weight
    inside the deterministic dead zone |w| < 0.5, so the whole net
    quantizes to 0: zero forward, vanishing STE gradients through the zero
    downstream weights, training stuck at chance (measured r5: 0.075 on
    digits vs 0.99 after this fix). Masters must straddle the ±0.5
    thresholds from the start; BatchNorm absorbs the larger activation
    scale."""
    import jax
    import jax.numpy as jnp

    return jax.random.uniform(key, shape, dtype or jnp.float32, -1.0, 1.0)


def _ternary_quant(deterministic: bool):
    if deterministic:
        return ops.ternary_connect_det
    # Same test-time rule as stochastic BinaryConnect (see nn/binary.py):
    # E[T(w)] = sign(w)*|w| = clip(w), so eval uses the clipped master.
    import jax.numpy as jnp

    return stochastic(
        ops.ternary_connect_stoch, eval_fn=lambda w: jnp.clip(w, -1.0, 1.0)
    )


class LinearTer(nn.Module):
    features: int
    deterministic: bool = True
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return QuantDense(
            features=self.features,
            weight_quant=_ternary_quant(self.deterministic),
            kernel_init=ternary_spread_init,
            use_bias=self.use_bias,
            dtype=self.dtype,
            scheme="ternary",
            w_bits=2,
            name="dense",
        )(x, train=train)


class TerConv(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    deterministic: bool = True
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return QuantConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            weight_quant=_ternary_quant(self.deterministic),
            kernel_init=ternary_spread_init,
            use_bias=self.use_bias,
            dtype=self.dtype,
            scheme="ternary",
            w_bits=2,
            name="conv",
        )(x, train=train)
