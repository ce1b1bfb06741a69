"""BNN LeNet-style conv net for MNIST (BASELINE config 2).

Binarized weights AND activations (BNN, arXiv:1602.02830): sign-binarize
activations with hard-tanh STE after BatchNorm; first conv takes real-valued
inputs (standard BNN practice — binarizing raw pixels destroys the input),
last layer is a binary-weight dense classifier.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as fnn

from pytorch_quantize_impls_tpu import nn as qnn


class BNNLeNet(fnn.Module):
    classes: int = 10
    quantized: bool = True
    width: int = 32
    # Learnable per-input-channel scale on each binarized activation
    # (magnitude restoration — see nn/binary.py ``_input_binarizer``).
    act_scale: bool = False
    # Mixed-precision compute dtype (fp32 masters untouched).
    dtype: Optional[Any] = None

    @fnn.compact
    def __call__(self, x, train: bool = True):
        w = self.width

        def conv(f, name, binarize_input):
            if self.quantized:
                return qnn.BinConv(
                    features=f,
                    kernel_size=(5, 5),
                    padding="VALID",
                    binarize_input=binarize_input,
                    act_scale=self.act_scale,
                    use_bias=False,
                    dtype=self.dtype,
                    name=name,
                )
            return fnn.Conv(
                features=f, kernel_size=(5, 5), padding="VALID", use_bias=False,
                dtype=self.dtype, name=name,
            )

        def dense(f, name, binarize_input=True):
            if self.quantized:
                return qnn.LinearBin(
                    features=f, binarize_input=binarize_input,
                    act_scale=self.act_scale, use_bias=False,
                    dtype=self.dtype, name=name,
                )
            return fnn.Dense(features=f, use_bias=False, dtype=self.dtype, name=name)

        def call(layer, x):
            return layer(x, train=train) if self.quantized else layer(x)

        x = call(conv(w, "conv1", binarize_input=False), x)  # real-valued input
        x = fnn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = fnn.max_pool(x, (2, 2), strides=(2, 2))
        x = call(conv(2 * w, "conv2", binarize_input=True), x)
        x = fnn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        x = fnn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = call(dense(8 * w, "fc1"), x)
        x = fnn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn3")(x)
        x = call(dense(self.classes, "head"), x)
        return x
