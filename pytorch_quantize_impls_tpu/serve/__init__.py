"""Continuous-batching inference service — NEW scope (SURVEY.md §2
parallelism table: "host-side request queue + batch assembly feeding a
pjit'd packed forward fn across hosts"; no reference counterpart)."""

from pytorch_quantize_impls_tpu.serve.engine import (  # noqa: F401
    EngineStats,
    InferenceEngine,
)
from pytorch_quantize_impls_tpu.serve.generate import (  # noqa: F401
    decode_model,
    generate,
    prefill,
)
from pytorch_quantize_impls_tpu.serve.decode_engine import (  # noqa: F401
    DecodeEngine,
    DecodeStats,
)
