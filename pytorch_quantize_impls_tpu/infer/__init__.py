"""Inference engine: the train(fake-quant) -> infer(packed) seam.

The reference has only a vestigial eval seam (``model.eval()`` freezing —
SURVEY.md §3.5); here eval-mode models are *exported* to bit-packed buffers +
scales and executed by the Pallas kernels:

    packed = infer.pack_model(model, variables, sample_x)   # once
    ready  = infer.prepare(packed)                          # decode hot bufs
    y      = infer.packed_apply(model, variables, ready, x) # fast path

``pack_model``/``packed_apply`` use flax method interception, so ANY flax
model built from this library's quantized layers works — no per-model export
code. ``save_packed``/``load_packed`` give the inference-only artifact format
(packed ints + scales + metadata; SURVEY.md §5 checkpoint row).
"""

from pytorch_quantize_impls_tpu.infer.packed import (  # noqa: F401
    PackedLayer,
    load_packed,
    pack_model,
    packed_apply,
    prepare,
    save_packed,
)
from pytorch_quantize_impls_tpu.infer.fused_chain import (  # noqa: F401
    FusedChain,
    export_fused_chain,
    export_fused_lenet,
    export_fused_resnet20,
    fused_apply,
    fused_resnet_apply,
)
from pytorch_quantize_impls_tpu.infer.fused_decode import (  # noqa: F401
    FusedDecodeModel,
    export_fused_decode,
    fused_decode_apply,
    fused_init_cache,
)
from pytorch_quantize_impls_tpu.infer import host_export  # noqa: F401
