"""Quantized NN layers (reference L1: ``QuantTorch/layers/`` — SURVEY.md §2).

Drop-in quantized replacements for dense/conv layers, built on ``flax.linen``
(the JAX-idiomatic counterpart of the reference's ``torch.nn`` wrappers).
Fake-quant happens **per forward call** from the persistent fp32 master
weight, exactly as the reference does (SURVEY.md §3.1); the packed fast path
is a separate inference export (``pytorch_quantize_impls_tpu.infer``).

Stochastic quantizers draw from the ``'quant'`` RNG collection:
``model.apply(params, x, train=True, rngs={'quant': key})``.
Elastic layers sow their penalties into the ``'losses'`` collection.
"""

from pytorch_quantize_impls_tpu.nn.base import (  # noqa: F401
    QuantConv,
    QuantDense,
    collect_elastic_losses,
)
from pytorch_quantize_impls_tpu.nn.binary import (  # noqa: F401
    BinConv,
    LinearBin,
    ShiftNormBatch,
)
from pytorch_quantize_impls_tpu.nn.xnor import XNORConv, XNORLinear  # noqa: F401
from pytorch_quantize_impls_tpu.nn.dorefa import (  # noqa: F401
    DorefaConv,
    LinearDorefa,
)
from pytorch_quantize_impls_tpu.nn.log_lin import (  # noqa: F401
    ConvQuantLin,
    ConvQuantLog,
    LinearQuantLin,
    LinearQuantLog,
)
from pytorch_quantize_impls_tpu.nn.ternary import (  # noqa: F401
    LinearTer,
    TerConv,
)
from pytorch_quantize_impls_tpu.nn.elastic import (  # noqa: F401
    ElasticConv,
    ElasticLinear,
)
from pytorch_quantize_impls_tpu.nn.pact import PACT  # noqa: F401
from pytorch_quantize_impls_tpu.nn.moe import QuantMoE  # noqa: F401
