"""Packed 2-D convolution = im2col (XLA patch extraction) + packed GEMM.

Covers BASELINE configs 2-5 (conv models). The patch extraction is a
bandwidth-bound reshuffle XLA does well; the FLOPs all land in the packed
Pallas GEMM, so the conv inherits the GEMM's int8/bf16 MXU throughput.
Layouts: x NHWC, weights HWIO flattened to (kh*kw*cin, cout) *before*
packing (same flattening order as ``conv_general_dilated_patches`` emits —
feature dim ordered as (cin, kh, kw), see ``_flatten_hwio``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from pytorch_quantize_impls_tpu.kernels import xnor_gemm as bg
from pytorch_quantize_impls_tpu.kernels import packed_matmul as pm
from pytorch_quantize_impls_tpu.kernels import shift_matmul as sm


class PackedConv(NamedTuple):
    """Frozen packed conv weights + metadata (inference export unit)."""

    scheme: str  # 'binary' | 'xnor' | 'dorefa' | 'log'
    packed: jax.Array
    kernel_size: Tuple[int, int]
    cin: int
    cout: int
    alpha: Optional[jax.Array] = None  # xnor per-out-channel scale
    w_bits: int = 1
    a_bits: int = 32
    fsr: float = 0.0


def _flatten_hwio(w: jax.Array) -> jax.Array:
    """HWIO (kh,kw,cin,cout) -> (cin*kh*kw, cout) in patch order.

    ``conv_general_dilated_patches`` with NHWC emits features ordered
    channel-major: (cin, kh, kw).
    """
    kh, kw, cin, cout = w.shape
    return w.transpose(2, 0, 1, 3).reshape(cin * kh * kw, cout)


def pack_conv_weights(
    w: jax.Array,
    scheme: str,
    *,
    w_bits: int = 1,
    a_bits: int = 32,
    fsr: float = 0.0,
) -> PackedConv:
    """Pack HWIO conv weights for the given scheme (weights already on-grid
    for 'dorefa'; raw fp for 'binary'/'xnor'/'log')."""
    kh, kw, cin, cout = w.shape
    flat = _flatten_hwio(w)
    alpha = None
    if scheme == "xnor":
        alpha = jnp.mean(jnp.abs(w), axis=(0, 1, 2))
        packed = bg.pack_binary_weights(flat)
    elif scheme == "binary":
        packed = bg.pack_binary_weights(flat)
    elif scheme == "dorefa":
        packed = pm.pack_dorefa_weights(flat, w_bits)
    elif scheme == "log":
        packed = sm.pack_log_weights(flat, fsr, w_bits)
    else:
        raise ValueError(f"unknown scheme {scheme!r}")
    return PackedConv(
        scheme, packed, (kh, kw), cin, cout, alpha, w_bits, a_bits, fsr
    )


def packed_conv2d(
    x: jax.Array,
    pw: PackedConv,
    *,
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
    interpret: Optional[bool] = None,
) -> jax.Array:
    """NHWC packed conv. Input handling per scheme:

    'binary'/'xnor': x is sign-binarized (full-binary conv; pre-scale real
    inputs outside if needed); 'dorefa': x is fake-quant [0,1] activations
    (``a_bits``); 'log': x used as-is in bf16.
    """
    b, h, w_, cin = x.shape
    kh, kw = pw.kernel_size
    if pw.scheme in ("binary", "xnor"):
        # Binarize BEFORE patch extraction so SAME-padding zeros stay 0
        # (ternary int8 input to the GEMM), matching zero-padded fake-quant
        # conv semantics. binarize_to_int8 would map padding 0 -> +1.
        x = jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)
    patches = jax.lax.conv_general_dilated_patches(
        x,
        (kh, kw),
        strides,
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bo, ho, wo, kdim = patches.shape
    flat = patches.reshape(bo * ho * wo, kdim)
    if pw.scheme in ("binary", "xnor"):
        xi = flat.astype(jnp.int8)  # exact {-1, 0, +1}
        out = bg.binary_gemm(xi, pw.packed, pw.alpha, interpret=interpret)
    elif pw.scheme == "dorefa":
        codes = pm.dorefa_act_to_int8(flat, pw.a_bits)
        out = pm.dorefa_gemm(
            codes, pw.packed, w_bits=pw.w_bits, a_bits=pw.a_bits,
            interpret=interpret,
        )
    elif pw.scheme == "log":
        out = sm.shift_gemm(
            flat, pw.packed, fsr=pw.fsr, bits=pw.w_bits, interpret=interpret
        )
    else:
        raise ValueError(pw.scheme)
    return out.reshape(bo, ho, wo, pw.cout)
