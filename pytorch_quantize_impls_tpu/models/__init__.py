"""Model zoo (reference L2: ``QuantTorch/nets/`` — SURVEY.md §2-L2), covering
the five BASELINE.json evaluation configs:

1. ``BinaryConnectMLP``   — 784-512-512-10 MNIST (config 1)
2. ``BNNLeNet``           — binarized W+A LeNet-style conv, MNIST (config 2)
3. ``XNORConvNet``        — XNOR conv with per-channel alpha, CIFAR-10 (config 3)
4. ``DorefaResNet20``     — DoReFa W4A4 ResNet-20, CIFAR-10 (config 4)
5. ``LogQuantVGGSmall``   — power-of-2 weights VGG-small, CIFAR-10 (config 5)

plus fp32 twins (``quantized=False``) for Δ-accuracy parity runs.
"""

from pytorch_quantize_impls_tpu.models.mlp import BinaryConnectMLP, MLP  # noqa: F401
from pytorch_quantize_impls_tpu.models.lenet import BNNLeNet  # noqa: F401
from pytorch_quantize_impls_tpu.models.convnets import (  # noqa: F401
    LogQuantVGGSmall,
    XNORConvNet,
)
from pytorch_quantize_impls_tpu.models.resnet import DorefaResNet20  # noqa: F401
from pytorch_quantize_impls_tpu.models.transformer import (  # noqa: F401
    QuantAttention,
    QuantTransformerBlock,
    QuantTransformerLM,
)
