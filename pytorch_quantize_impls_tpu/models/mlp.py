"""MLPs for MNIST (BASELINE config 1; reference ``QuantTorch/nets/`` MLP,
SURVEY.md §2-L2: 784-512-512-10 style).

``BinaryConnectMLP`` binarizes weights only (BinaryConnect, arXiv:1511.00363);
all layers are binarized with BatchNorm between them, as in the paper. An
fp32 twin (``quantized=False``) serves the Δ-accuracy parity runs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as fnn
import jax.numpy as jnp

from pytorch_quantize_impls_tpu import nn as qnn


class MLP(fnn.Module):
    """Generic quantized MLP: [Dense -> BatchNorm -> ReLU]* -> Dense."""

    features: Sequence[int] = (512, 512, 10)
    layer: str = "bin"  # bin | bin_stoch | ternary | dorefa | log | lin | fp32
    bits: int = 4
    fsr: float = 1.0
    use_batchnorm: bool = True

    def _dense(self, f: int, name: str):
        if self.layer == "bin":
            return qnn.LinearBin(features=f, name=name)
        if self.layer == "bin_stoch":
            return qnn.LinearBin(features=f, deterministic=False, name=name)
        if self.layer == "ternary":
            return qnn.LinearTer(features=f, name=name)
        if self.layer == "dorefa":
            return qnn.LinearDorefa(features=f, bits=self.bits, name=name)
        if self.layer == "log":
            return qnn.LinearQuantLog(features=f, fsr=self.fsr, bits=self.bits, name=name)
        if self.layer == "lin":
            return qnn.LinearQuantLin(features=f, fsr=self.fsr, bits=self.bits, name=name)
        if self.layer == "fp32":
            return fnn.Dense(features=f, name=name)
        raise ValueError(f"unknown layer kind {self.layer!r}")

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x = x.reshape((x.shape[0], -1))
        for i, f in enumerate(self.features[:-1]):
            layer = self._dense(f, f"layer{i}")
            x = layer(x, train=train) if self.layer != "fp32" else layer(x)
            if self.use_batchnorm:
                x = fnn.BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = fnn.relu(x)
        layer = self._dense(self.features[-1], "head")
        x = layer(x, train=train) if self.layer != "fp32" else layer(x)
        return x


def BinaryConnectMLP(
    hidden: int = 512, classes: int = 10, *, deterministic: bool = True,
    quantized: bool = True,
) -> MLP:
    """BASELINE config 1: BinaryConnect MLP 784-512-512-10 on MNIST."""
    kind = "fp32" if not quantized else ("bin" if deterministic else "bin_stoch")
    return MLP(features=(hidden, hidden, classes), layer=kind)
