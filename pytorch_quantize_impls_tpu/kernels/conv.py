"""Packed 2-D convolution: int8 MXU conv from bit-packed HBM weights.

Covers BASELINE configs 2-5 (conv models). Two execution modes:

``direct`` (default): decode the packed weight planes to int8 codes
(weights are KB-scale — the decode is noise next to the conv) and call
XLA's native int8 ``conv_general_dilated`` with ``preferred_element_type=
int32`` plus a fused scale epilogue. Measured on v5e at the CIFAR models'
hot shapes (r4, on-device chained timing): 295-312 T/s at the 256/512-ch
stages — 9.3-9.9x the fp32-HIGHEST conv — while weights stay 1/2/4-bit
in HBM. The 128-ch stage is occupancy/boundary-bound at ~97 T/s (3.5x).

``im2col``: materialize ``conv_general_dilated_patches`` in HBM and run the
packed Pallas GEMM. Kept as the cross-check path (and for shapes where a
patch GEMM is preferable), but it is bandwidth-bound: the fp32 patch tensor
is kh*kw x the activation bytes, which caps it at 0.2-0.4x fp32 conv at
CIFAR shapes (PERF.md r3) — hence not the default.

Layouts: x NHWC, weights HWIO flattened to (cin*kh*kw, cout) *before*
packing (feature dim ordered (cin, kh, kw) — the order
``conv_general_dilated_patches`` emits, see ``_flatten_hwio``); the direct
mode inverts that flattening back to HWIO after decoding.
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


_DN = ("NHWC", "HWIO", "NHWC")


def decode_conv_weights(pw: PackedConv) -> jax.Array:
    """Packed flat planes -> HWIO code weights for the direct conv path.

    binary/xnor: ±1 int8; dorefa: centered int8 codes ``2c - n_w``;
    log: exact ±2^e bf16. Inverts ``_flatten_hwio``'s (cin, kh, kw)
    channel-major flattening (decode pads K to the plane group — slice it).
    """
    kh, kw = pw.kernel_size
    k = pw.cin * kh * kw
    if pw.scheme in ("binary", "xnor"):
        flat = bg.decode_binary_weights(pw.packed)[:k]
    elif pw.scheme == "dorefa":
        flat = pm.decode_dorefa_weights(pw.packed, w_bits=pw.w_bits)[:k]
    elif pw.scheme == "log":
        flat = sm.decode_log_weights(pw.packed, fsr=pw.fsr, bits=pw.w_bits)[:k]
    else:
        raise ValueError(pw.scheme)
    return flat.reshape(pw.cin, kh, kw, pw.cout).transpose(1, 2, 0, 3)


def _direct_conv2d(x, pw: PackedConv, strides, padding):
    """Decoded-weight XLA conv: int8 MXU for binary/xnor/dorefa (exact
    integer accumulate + scalar epilogue), bf16 for log."""
    w4 = decode_conv_weights(pw)
    if pw.scheme in ("binary", "xnor"):
        # Binarize real inputs to ±1 codes; conv's internal SAME-padding
        # zeros are exact (code 0 == value 0), matching fake-quant conv.
        xi = x if x.dtype == jnp.int8 else jnp.where(x >= 0, 1, -1).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xi, w4, strides, padding, dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        if pw.alpha is not None:
            y = y * pw.alpha
        return y
    if pw.scheme == "dorefa":
        codes = x if x.dtype == jnp.int8 else pm.dorefa_act_to_int8(x, pw.a_bits)
        y = jax.lax.conv_general_dilated(
            codes, w4, strides, padding, dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        n_w = 2**pw.w_bits - 1
        n_a = 2**pw.a_bits - 1
        return y * (1.0 / (n_w * n_a))
    if pw.scheme == "log":
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w4, strides, padding,
            dimension_numbers=_DN, preferred_element_type=jnp.float32,
        )
        return y
    raise ValueError(pw.scheme)


def packed_conv2d(
    x: jax.Array,
    pw: PackedConv,
    *,
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
    interpret: Optional[bool] = None,
    mode: str = "direct",
) -> jax.Array:
    """NHWC packed conv. Input handling per scheme:

    'binary'/'xnor': x is sign-binarized (full-binary conv; pre-scale real
    inputs outside if needed); 'dorefa': x is fake-quant [0,1] activations
    (``a_bits``); 'log': x used as-is in bf16.

    ``mode='direct'`` (default) decodes weights and runs XLA's int8/bf16
    conv (see module docstring); ``mode='im2col'`` runs patch extraction +
    the packed Pallas GEMM.
    """
    if mode == "direct":
        return _direct_conv2d(x, pw, strides, padding)
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
