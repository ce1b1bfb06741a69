"""Quantizer math core (reference L0: ``QuantTorch/functions/`` — SURVEY.md §2).

Every quantizer is a pure function built on a ``jax.custom_vjp``
straight-through-estimator primitive. Stochastic quantizers take an explicit
PRNG ``key`` (JAX-idiomatic replacement for the reference's implicit torch RNG).
"""

from pytorch_quantize_impls_tpu.ops.common import (  # noqa: F401
    hard_sigmoid,
    safe_sign,
    ste,
    ste_clip,
    ste_identity,
)
from pytorch_quantize_impls_tpu.ops.binary import (  # noqa: F401
    binary_connect,
    binary_connect_det,
    binary_connect_stoch,
    binary_tanh,
)
from pytorch_quantize_impls_tpu.ops.ternary import (  # noqa: F401
    ternary_connect,
    ternary_connect_det,
    ternary_connect_stoch,
)
from pytorch_quantize_impls_tpu.ops.dorefa import (  # noqa: F401
    dorefa_activation,
    dorefa_gradient,
    dorefa_quantizers,
    dorefa_weight,
    quantize_k,
)
from pytorch_quantize_impls_tpu.ops.log_lin import (  # noqa: F401
    lin_quant,
    log_quant,
)
from pytorch_quantize_impls_tpu.ops.elastic import (  # noqa: F401
    binary_elastic_loss,
    lin_elastic_loss,
    log_elastic_loss,
)
from pytorch_quantize_impls_tpu.ops.pact import (  # noqa: F401
    pact,
    pact_alpha_penalty,
)
from pytorch_quantize_impls_tpu.ops.xnor import (  # noqa: F401
    sign_ste_clip,
    xnor_alpha,
    xnor_input_scale_map,
    xnor_quantize,
)
from pytorch_quantize_impls_tpu.ops.registry import (  # noqa: F401
    SCHEMES,
    STOCHASTIC_SCHEMES,
    get_quantizer,
)
from pytorch_quantize_impls_tpu.ops import pack  # noqa: F401
from pytorch_quantize_impls_tpu.ops.kv_cache import (  # noqa: F401
    dequantize_kv,
    quantize_kv,
)
