"""Fused single-token decode attention over the int8-quantized KV cache.

The serving decode step (serve/decode_engine.py) is KV-cache-bandwidth-bound
at batch >= 8: the generic path (models/transformer.py::_cached_attention)
materializes a dequantized bf16 copy of the WHOLE cache every step — for the
perf_bench serving model (8L, d1024, cl1024, b32) that is ~2.7 GB of HBM
traffic per token, which is why packed decode only reached 1.12x fake-quant
at b32 in r4 (PERF.md; VERDICT r4 #4). This kernel runs the s=1 attention in
ONE pass over the int8 codes:

    HBM:  q (b, h, hd) f32      k/v codes (b, h, cl, hd) int8
          k/v scales (b, h, cl) f32      mask bias (b, cl) f32
    VMEM: scores = (k_codes . q) * k_scale * rsqrt(hd) + bias   (f32)
          p = softmax(scores)  [numerically-stable, full row in VMEM]
          ctx = (p * v_scale) . v_codes / sum(p)

The per-(position, head) dequant scales FOLD INTO the score/attention
vectors (q.(c*s) == (q.c)*s), so the bf16 cache copy never exists; cache
traffic drops to the int8 codes themselves (~5x less). cl*hd int8 tiles fit
VMEM whole (1024x128 = 128 KB), so no online softmax is needed — one grid
program per (batch, head).

Mask is an additive f32 bias row per slot (0 valid / -1e30 invalid),
computed outside from the per-slot cursors — decode queries at position p
attend cache positions <= p (models/transformer.py cursor-causal rule).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pytorch_quantize_impls_tpu.kernels import common


def _kernel(q_ref, kc_ref, ks_ref, vc_ref, vs_ref, bias_ref, o_ref, *, hd: int,
            precision):
    # Mosaic discipline (both learned on real-TPU lowering, invisible to
    # the CPU interpreter): (a) block layouts keep trailing (1, cl) dims
    # equal to the array dims — scales ride as (b,h,1,cl), the mask bias
    # as (b,1,cl); (b) EVERYTHING stays rank-2 with keepdims reductions —
    # rank-1 intermediates hit "Not implemented: Offset change" in
    # vector.multi_reduction.
    q = q_ref[0, 0].astype(jnp.float32)  # (1, hd)
    k = kc_ref[0, 0].astype(jnp.float32)  # (cl, hd)
    # scores = (q . k_i) * k_scale_i / sqrt(hd) + bias_i   — (1, cl)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (1, cl)
    s = s * ks_ref[0, 0] * jax.lax.rsqrt(jnp.float32(hd)) + bias_ref[0]
    m = jnp.max(s, axis=1, keepdims=True)  # (1, 1)
    p = jnp.exp(s - m)  # (1, cl)
    denom = jnp.sum(p, axis=1, keepdims=True)  # (1, 1)
    # fold the v dequant scale into the (unnormalized) attention weights
    pv = p * vs_ref[0, 0]  # (1, cl)
    v = vc_ref[0, 0].astype(jnp.float32)  # (cl, hd)
    ctx = jax.lax.dot_general(
        pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # (1, hd)
    o_ref[0, 0] = (ctx / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def decode_attention(
    q: jax.Array,
    k_codes: jax.Array,
    k_scale: jax.Array,
    v_codes: jax.Array,
    v_scale: jax.Array,
    mask_bias: jax.Array,
    *,
    interpret: Optional[bool] = None,
    precision=None,
) -> jax.Array:
    """One-token attention over the quantized cache.

    Args:
      q: (b, h, hd) query for the single decode position (f32/bf16).
      k_codes/v_codes: (b, h, cl, hd) int8 cache codes (b-h-major layout —
        the fused serving cache, infer/fused_decode.py).
      k_scale/v_scale: (b, h, cl) f32 per-(position, head) dequant scales.
      mask_bias: (b, cl) f32 additive bias, 0 where the position is
        attendable and -1e30 where not.
      precision: dot precision for the score/context matvecs. Default
        (None = fastest bf16 passes) carries ~2e-2 relative ctx noise —
        measured on-chip to be EXACTLY the bf16-pass noise the model's own
        default-precision einsum attention has (refs differ from the exact
        answer by the same 2.1e-2), so it is not a degradation vs the path
        it replaces. ``jax.lax.Precision.HIGHEST`` makes the kernel
        f32-exact (measured 2e-6) but costs ~35% tok/s at batch 8-32: the
        (1, hd) matvecs are MXU-pass-bound, so 3-pass multiplies are not
        free here.
    Returns:
      (b, h, hd) f32 attention context.
    """
    if interpret is None:
        interpret = common.use_interpret()
    b, h, hd = q.shape
    cl = k_codes.shape[2]
    assert k_codes.shape == (b, h, cl, hd), (k_codes.shape, (b, h, cl, hd))
    assert mask_bias.shape == (b, cl), mask_bias.shape
    q3 = q.reshape(b, h, 1, hd)
    ks4 = k_scale.reshape(b, h, 1, cl)
    vs4 = v_scale.reshape(b, h, 1, cl)
    bias3 = mask_bias.reshape(b, 1, cl)
    grid = (b, h)
    out = pl.pallas_call(
        functools.partial(_kernel, hd=hd, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, hd), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, cl, hd), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, cl, hd), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, cl), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, cl), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, hd), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, hd), jnp.float32),
        interpret=interpret,
    )(q3, k_codes, ks4, v_codes, vs4, bias3)
    return out.reshape(b, h, hd)
