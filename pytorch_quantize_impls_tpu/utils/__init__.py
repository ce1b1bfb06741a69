"""Aux subsystems (SURVEY.md §5): checkpoint/resume (orbax), profiling,
metrics/logging, and run configs. The reference has none of these."""

from pytorch_quantize_impls_tpu.utils.checkpoint import (  # noqa: F401
    CheckpointManager,
)
from pytorch_quantize_impls_tpu.utils.metrics import MetricsWriter  # noqa: F401
from pytorch_quantize_impls_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    trace,
)
from pytorch_quantize_impls_tpu.utils.config import (  # noqa: F401
    RunConfig,
    SCHEME_CONFIGS,
)
from pytorch_quantize_impls_tpu.utils import native  # noqa: F401
