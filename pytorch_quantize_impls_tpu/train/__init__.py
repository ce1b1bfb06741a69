"""Training glue (reference L2: notebooks/training loops — SURVEY.md §2-L2,
§3.3), rebuilt as functional JAX: optax optimizer chains with the
clamp-after-step weight clipping as a gradient transformation, a TrainState
carrying batch stats and RNG, and jit/shard-ready train-step builders."""

from pytorch_quantize_impls_tpu.train.clipping import (  # noqa: F401
    clip_params,
    clip_quantized_weights,
    default_clip_filter,
)
from pytorch_quantize_impls_tpu.train.quantized_optim import (  # noqa: F401
    Quantized8,
    QuantizedAdamState,
    optimizer_state_bytes,
    quantized_adam,
)
from pytorch_quantize_impls_tpu.train.state import QuantTrainState  # noqa: F401
from pytorch_quantize_impls_tpu.train.steps import (  # noqa: F401
    make_eval_step,
    make_train_step,
)
