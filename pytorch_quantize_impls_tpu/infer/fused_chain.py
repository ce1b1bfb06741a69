"""Fused int8-chained inference for sequential binary-conv stacks.

VERDICT r3 #3 / BASELINE.json:5 ("every dequant/popcount matmul kernel at
speed-of-light"): the generic packed path (``infer/packed.py``) runs each
conv's int32 accumulator through f32 (+α), eval BatchNorm, and pooling in
f32, then re-binarizes at the next conv's input — three full-activation
f32 HBM round-trips per stage. At the CIFAR widths that boundary traffic
capped the whole XNOR ConvNet at 0.91× its bf16 twin (PERF.md r3) even
though the conv kernel alone is 3–7× faster.

This module folds the entire stage boundary into the conv epilogue.
Eval-mode BatchNorm is a per-channel affine ``z = γ·(αy − μ)/s + β``
(``s = sqrt(σ² + ε)``, ``u = α·y`` the α-scaled conv accumulator) and the
next layer's input binarization is ``sign(z)`` — so the next layer's input
codes are a per-channel *threshold comparison* on the raw conv accumulator:

    code = hi  if y >= t,  else lo
    t    = (μ − β·s/γ) / α
    (hi, lo) = (+1, −1) if γ > 0;  (−1, +1) if γ < 0;  (sign(β),)·2 if γ = 0

Max-pooling commutes with the monotone ``sign`` (``pool(sign(z)) ==
sign(pool(z))``, including the γ<0 flip because the flip happens inside the
per-element code), so pooling runs on the int8 codes. Activations therefore
cross stage boundaries as ±1 int8 — 1 byte, never materialized in f32 —
and the hidden convs run int8×int8→int32 on the MXU.

Exactness: every int8-input stage is exact integer arithmetic; the only
deviations from the fake-quant path are (a) the threshold is computed in a
different f32 expression order than BN's (boundary-ulp differences at
measure-zero inputs), and (b) for γ<0 a y exactly at the threshold codes −1
instead of +1 (the fake path's sign(0)→+1; measure-zero again). The parity
test gates on logits, not codes.

Constraint: the XNOR input scale map K must be off
(``XNORConvNet(use_input_scale_map=False)``) — K is computed from real
input magnitudes the code chain never materializes. The XNOR paper (§3.2
discussion) itself drops K at inference for speed.

Reference lineage: the reference (QuantTorch) has no true low-bit execution
at all (SURVEY.md §1: fake-quant only); this path is new scope mandated by
BASELINE.json:5.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as fnn
import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from pytorch_quantize_impls_tpu.kernels import xnor_gemm as _bg


@struct.dataclass
class FusedStage:
    """One conv stage with its boundary folded into the epilogue."""

    w: jax.Array  # HWIO weights: int8 ±1 codes (code-input) or fp (first)
    # binarize epilogue (hidden stages): per-cout threshold + codes
    thr: Optional[jax.Array] = None  # f32 per-cout
    hi: Optional[jax.Array] = None  # int8 per-cout, code when y >= thr
    lo: Optional[jax.Array] = None  # int8 per-cout, code when y <  thr
    # real epilogue (last stage): z = y*scale + bias  (BN+α folded)
    scale: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    # static
    in_codes: bool = struct.field(pytree_node=False, default=True)
    pool: bool = struct.field(pytree_node=False, default=False)
    strides: Tuple[int, int] = struct.field(pytree_node=False, default=(1, 1))
    padding: str = struct.field(pytree_node=False, default="SAME")


@struct.dataclass
class FusedHead:
    w: jax.Array  # (features_in, classes) — ±1 codes or fp kernel
    alpha: Optional[jax.Array] = None  # xnor per-class scale
    bias: Optional[jax.Array] = None


@struct.dataclass
class FusedChain:
    stages: Tuple[FusedStage, ...]
    head: FusedHead


_DN = ("NHWC", "HWIO", "NHWC")


def _bn_affine(params, stats, eps=1e-5):
    gamma = params["scale"].astype(jnp.float32)
    beta = params["bias"].astype(jnp.float32)
    mean = stats["mean"].astype(jnp.float32)
    s = jnp.sqrt(stats["var"].astype(jnp.float32) + eps)
    return gamma, beta, mean, s


def _binarize_epilogue(gamma, beta, mean, s, alpha):
    """(thr, hi, lo) for code = sign(BN(α·y)) as a threshold on raw y."""
    safe_g = jnp.where(gamma == 0, 1.0, gamma)
    t = (mean - beta * s / safe_g) / alpha
    sign_b = jnp.where(beta >= 0, 1, -1).astype(jnp.int8)
    hi = jnp.where(gamma > 0, 1, jnp.where(gamma < 0, -1, sign_b)).astype(jnp.int8)
    lo = jnp.where(gamma > 0, -1, jnp.where(gamma < 0, 1, sign_b)).astype(jnp.int8)
    # γ==0: code is constant sign(β); force the threshold comparison moot
    t = jnp.where(gamma == 0, -jnp.inf, t)
    return t.astype(jnp.float32), hi, lo


def export_fused_chain(model, variables, *, first_dtype=jnp.bfloat16) -> FusedChain:
    """Build a :class:`FusedChain` from a trained ``XNORConvNet``.

    Requires ``quantized=True, binarize_inputs=True,
    use_input_scale_map=False`` (see module docstring). ``first_dtype``:
    compute dtype for the first (real-input) conv — ``bfloat16`` on TPU,
    pass ``float32`` for bit-level parity testing on CPU.
    """
    if not (model.quantized and model.binarize_inputs):
        raise ValueError("fused chain needs quantized=True, binarize_inputs=True")
    if model.use_input_scale_map:
        raise ValueError(
            "fused chain needs use_input_scale_map=False (K depends on real "
            "input magnitudes the int8 code chain never materializes)"
        )
    params = variables["params"]
    stats = variables["batch_stats"]
    n = len(model.widths)
    stages = []
    for i in range(n):
        fp_first = model.fp32_first_last and i == 0
        if fp_first:
            kernel = params[f"conv{i}"]["kernel"].astype(jnp.float32)
            w = kernel.astype(first_dtype)
            alpha = jnp.ones((kernel.shape[-1],), jnp.float32)
        else:
            kernel = params[f"conv{i}"]["conv"]["kernel"].astype(jnp.float32)
            alpha = jnp.mean(jnp.abs(kernel), axis=(0, 1, 2))
            codes = jnp.where(kernel >= 0, 1, -1).astype(jnp.int8)
            w = codes if i > 0 else codes.astype(first_dtype)
        gamma, beta, mean, s = _bn_affine(params[f"bn{i}"], stats[f"bn{i}"])
        last = i == n - 1
        if last:
            # real epilogue: z = γ(αy − μ)/s + β = (γα/s)·y + (β − γμ/s)
            st = FusedStage(
                w=w,
                scale=(gamma * alpha / s).astype(jnp.float32),
                bias=(beta - gamma * mean / s).astype(jnp.float32),
                in_codes=i > 0,
                pool=i % 2 == 1,
            )
        else:
            thr, hi, lo = _binarize_epilogue(gamma, beta, mean, s, alpha)
            st = FusedStage(
                w=w, thr=thr, hi=hi, lo=lo, in_codes=i > 0, pool=i % 2 == 1
            )
        stages.append(st)
    if model.fp32_first_last:
        hp = params["head"]
        head = FusedHead(
            w=hp["kernel"].astype(jnp.float32), bias=hp.get("bias")
        )
    else:
        hp = params["head"]["dense"]
        k = hp["kernel"].astype(jnp.float32)
        head = FusedHead(
            w=jnp.where(k >= 0, 1.0, -1.0).astype(jnp.float32),
            alpha=jnp.mean(jnp.abs(k), axis=0),
            bias=hp.get("bias"),
        )
    return FusedChain(stages=tuple(stages), head=head)


def _max_pool(x):
    init = (
        jnp.array(np.iinfo(np.int8).min, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer)
        else jnp.array(-jnp.inf, x.dtype)
    )
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def fused_apply(chain: FusedChain, x: jax.Array) -> jax.Array:
    """Forward through the fused chain. ``x``: NHWC real images."""
    h = x
    for st in chain.stages:
        if st.in_codes:
            y = jax.lax.conv_general_dilated(
                h, st.w, st.strides, st.padding, dimension_numbers=_DN,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            y = jax.lax.conv_general_dilated(
                h.astype(st.w.dtype), st.w, st.strides, st.padding,
                dimension_numbers=_DN, preferred_element_type=jnp.float32,
            )
        if st.thr is not None:
            h = jnp.where(y >= st.thr, st.hi, st.lo)  # int8 codes out
        else:
            h = y * st.scale + st.bias
        if st.pool:
            h = _max_pool(h)
    h = h.reshape(h.shape[0], -1).astype(jnp.float32)
    y = jnp.dot(h, chain.head.w, preferred_element_type=jnp.float32)
    if chain.head.alpha is not None:
        y = y * chain.head.alpha
    if chain.head.bias is not None:
        y = y + chain.head.bias
    return y
