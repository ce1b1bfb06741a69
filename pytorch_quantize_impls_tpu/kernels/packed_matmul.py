"""DoReFa k-bit packed GEMM (INT2/INT4 weights) on the int8 MXU.

Math: DoReFa fake-quant weights lie on the grid ``w_q = (2 c_w - n_w)/n_w``
(codes ``c_w`` in [0, n_w], ``n_w = 2^b - 1``) and activations on
``a_q = c_a/n_a``. Decoding weights to *centered* integer codes
``d = 2 c_w - n_w`` (odd values in [-n_w, n_w] — int8-exact for b <= 4)
makes the product a single integer GEMM with a scalar epilogue:

    y = a_q · w_q = (c_a · d) / (n_a * n_w)

— exact, no dequant multiply inside the loop and no activation row-sum
correction pass (the v1 formulation did ``2*(c_a·c_w) - n_w*rowsum(c_a)``,
paying an extra full read of the activations for the row sums). Codes are
planar-packed (2/4-bit in uint32 lanes, ``ops.pack.pack_bitplanes``),
unpacked + centered in VMEM, MXU-multiplied as int8. This is the TPU
replacement for CUDA "packed sub-byte" tricks: sub-byte storage in HBM,
int8 compute at ~377 TOP/s.

``w_bits >= 8`` is rejected: centered 8-bit codes (±255) overflow int8 —
use the bf16 fake-quant path for 8-bit weights (the MXU has no wider
integer mode, so there is nothing to win).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_quantize_impls_tpu.kernels import common
from pytorch_quantize_impls_tpu.ops import pack as packlib


def _check_w_bits(bits: int) -> None:
    if bits >= 8:
        raise ValueError(
            f"w_bits={bits}: centered codes 2c-n_w span ±{2**bits - 1}, "
            "which overflows the int8 MXU operand; use the bf16 fake-quant "
            "path for >=8-bit weights"
        )


def pack_dorefa_weights(wq: jax.Array, bits: int) -> jax.Array:
    """DoReFa fake-quant weights (K, N) -> planar packed codes.

    ``wq`` must already be on the DoReFa grid (output of
    ``ops.dorefa_weight`` with the same ``bits``).
    """
    _check_w_bits(bits)
    codes = packlib.dorefa_weight_to_codes(wq, bits)
    return packlib.pack_bitplanes(codes, bits)


def dorefa_act_to_int8(aq: jax.Array, bits: int) -> jax.Array:
    """DoReFa fake-quant activations ([0,1] grid) -> int8 codes.

    ``bits <= 7``: codes must fit signed int8 for the MXU (2^8-1 = 255
    overflows). 8-bit activations should use the bf16 path instead.
    """
    if bits > 7:
        raise ValueError(
            f"a_bits={bits} overflows int8 activation codes (max 7); "
            "use bf16 fake-quant for 8-bit activations"
        )
    return packlib.dorefa_act_to_codes(aq, bits).astype(jnp.int8)


def _unpack_centered(p, bits: int):
    """Grouped-planar uint32 tile -> centered int8 codes 2c - n_w."""
    f = 32 // bits
    mask = jnp.uint32(2**bits - 1)
    n_w = 2**bits - 1
    rows = p.shape[0]
    parts = []
    for g in range(rows // packlib.GROUP_ROWS):
        grp = p[g * packlib.GROUP_ROWS : (g + 1) * packlib.GROUP_ROWS]
        for i in range(f):
            c = ((grp >> jnp.uint32(bits * i)) & mask).astype(jnp.int32)
            parts.append(2 * c - n_w)
    return jnp.concatenate(parts, axis=0).astype(jnp.int8)


def _kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k, bits, inv_scale):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_centered(w_ref[:], bits)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * inv_scale).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("w_bits", "a_bits", "out_dtype", "interpret", "tiles")
)
def dorefa_gemm(
    a_codes: jax.Array,
    w_packed: jax.Array,
    *,
    w_bits: int,
    a_bits: int,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    tiles=None,
):
    """(M,K) int8 activation codes @ planar w codes -> (M,N) fake-quant-exact.

    Output equals ``dorefa_activation(x, a_bits) @ dorefa_weight(w, w_bits)``
    up to f32 rounding.
    """
    _check_w_bits(w_bits)
    if interpret is None:
        interpret = common.use_interpret()
    f = 32 // w_bits
    gk = packlib.planar_group_k(w_bits)
    m, k = a_codes.shape
    r, n = w_packed.shape
    kp = r * f
    assert kp % gk == 0, (kp, gk)
    a_codes = common.pad_dim(a_codes, 1, kp)
    n_w = 2**w_bits - 1
    n_a = 2**a_bits - 1
    inv_scale = 1.0 / (n_w * n_a)

    # v5e-tuned (kernel_bench --kernel dorefa, r3 sweep): (1024, 256, 4096)
    # -> 337 T/s vs 258-324 at the old (256, 512, 4096) — the unpack of
    # each (k, j) weight tile repeats per M-tile, so a deep TM amortizes
    # it; TN drops to 256 to keep the decoded tile + x tile + accumulator
    # inside VMEM ((1024, 512, 4096) overflows).
    if tiles is None:
        tm = min(common.round_up(m, 128), 1024)
        tn = min(common.round_up(n, 128), 256 if tm >= 1024 else 512)
        tk = min(common.round_up(kp, 128), 4096)
    else:
        tm, tn, tk = tiles
    tk = min(common.round_up(tk, gk), kp)
    mp, np_, kp2 = common.round_up(m, tm), common.round_up(n, tn), common.round_up(kp, tk)
    a_codes = common.pad_dim(common.pad_dim(a_codes, 0, mp), 1, kp2)
    w_packed = common.pad_dim(common.pad_dim(w_packed, 0, kp2 // f), 1, np_)
    # K-padding: packed code 0 decodes to -n_w, but multiplies against
    # zero-padded activation codes — exact, same as the binary kernel.

    n_k = kp2 // tk
    grid = (mp // tm, np_ // tn, n_k)
    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, bits=w_bits, inv_scale=inv_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tk // f, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp2,
            bytes_accessed=mp * kp2 + kp2 * np_ * w_bits // 8 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_codes, w_packed)
    return out[:m, :n]


def _ws_kernel(x_ref, w_ref, o_ref, acc_ref, wdec_ref, *, n_k, tm, bits,
               inv_scale):
    """Weight-stationary-unpack body: grid (j, k, i), i innermost.

    Each packed w tile (k, j) is unpacked ONCE (at i == 0) into the wdec
    VMEM scratch and reused by every M-tile; the accumulator is a full
    (n_i*tm, tn) strip so all M-tiles' partial sums persist across k.
    """
    k = pl.program_id(1)
    i = pl.program_id(2)
    rows = pl.ds(i * tm, tm)

    @pl.when(i == 0)
    def _():
        wdec_ref[:] = _unpack_centered(w_ref[:], bits)

    @pl.when(k == 0)
    def _():
        acc_ref[rows, :] = jnp.zeros((tm, acc_ref.shape[1]), jnp.int32)

    acc_ref[rows, :] += jnp.dot(
        x_ref[:], wdec_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[rows, :].astype(jnp.float32) * inv_scale).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("w_bits", "a_bits", "out_dtype", "interpret", "tiles")
)
def dorefa_gemm_ws(
    a_codes: jax.Array,
    w_packed: jax.Array,
    *,
    w_bits: int,
    a_bits: int,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    tiles=None,
):
    """Packed-resident DoReFa GEMM with a single unpack per weight tile.

    Same contract as :func:`dorefa_gemm`; wins when M is large enough that
    re-unpacking weights per M-tile dominates (the default kernel unpacks
    each (k, j) tile M/TM times; this one, once).
    """
    _check_w_bits(w_bits)
    if interpret is None:
        interpret = common.use_interpret()
    f = 32 // w_bits
    gk = packlib.planar_group_k(w_bits)
    m, k = a_codes.shape
    r, n = w_packed.shape
    kp = r * f
    assert kp % gk == 0, (kp, gk)
    a_codes = common.pad_dim(a_codes, 1, kp)
    n_w = 2**w_bits - 1
    n_a = 2**a_bits - 1
    inv_scale = 1.0 / (n_w * n_a)

    tm, tn, tk = tiles or (256, 512, 2048)
    tn = min(common.round_up(n, 128), tn)
    tk = min(common.round_up(tk, gk), kp)
    mp, np_, kp2 = common.round_up(m, tm), common.round_up(n, tn), common.round_up(kp, tk)
    a_codes = common.pad_dim(common.pad_dim(a_codes, 0, mp), 1, kp2)
    w_packed = common.pad_dim(common.pad_dim(w_packed, 0, kp2 // f), 1, np_)

    n_k = kp2 // tk
    n_i = mp // tm
    grid = (np_ // tn, n_k, n_i)
    out = pl.pallas_call(
        functools.partial(
            _ws_kernel, n_k=n_k, tm=tm, bits=w_bits, inv_scale=inv_scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda j, k, i: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tk // f, tn), lambda j, k, i: (k, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda j, k, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((mp, tn), jnp.int32),
            pltpu.VMEM((tk, tn), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp2,
            bytes_accessed=mp * kp2 * (np_ // tn) + kp2 * np_ * w_bits // 8
            + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_codes, w_packed)
    return out[:m, :n]


def _decode_kernel(p_ref, o_ref, *, bits):
    o_ref[:] = _unpack_centered(p_ref[:], bits)


@functools.partial(jax.jit, static_argnames=("w_bits", "interpret"))
def decode_dorefa_weights(
    w_packed: jax.Array, *, w_bits: int, interpret=None
) -> jax.Array:
    """Planar packed codes -> centered int8 codes 2c - n_w, shape (K, N).

    The one-time decode pass for serving: hot weights stay int8 (4x smaller
    than f32; the packed form is 8x-16x smaller still for cold storage).
    """
    _check_w_bits(w_bits)
    if interpret is None:
        interpret = common.use_interpret()
    f = 32 // w_bits
    gk = packlib.planar_group_k(w_bits)
    r, n = w_packed.shape
    k = r * f
    tk = min(common.round_up(k, gk), 2048)
    tn = min(common.round_up(n, 128), 1024)
    kp = common.round_up(k, tk)
    np_ = common.round_up(n, tn)
    w_packed = common.pad_dim(common.pad_dim(w_packed, 0, kp // f), 1, np_)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, bits=w_bits),
        grid=(kp // tk, np_ // tn),
        in_specs=[
            pl.BlockSpec(
                (tk // f, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec((tk, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, np_), jnp.int8),
        interpret=interpret,
    )(w_packed)
    return out[:k, :n]


@functools.partial(
    jax.jit, static_argnames=("w_bits", "a_bits", "out_dtype", "interpret")
)
def dorefa_gemm_decoded(
    a_codes: jax.Array,
    w_i8: jax.Array,
    *,
    w_bits: int,
    a_bits: int,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
):
    """Serving fast path: pre-decoded centered int8 weight codes through the
    tiled int8 GEMM; the 1/(n_a*n_w) dequant rides the alpha epilogue."""
    from pytorch_quantize_impls_tpu.kernels import int8_matmul

    n_w = 2**w_bits - 1
    n_a = 2**a_bits - 1
    k, n = w_i8.shape
    a_codes = common.pad_dim(a_codes, 1, k)
    alpha = jnp.full((n,), 1.0 / (n_w * n_a), jnp.float32)
    return int8_matmul.int8_gemm(
        a_codes, w_i8, alpha, out_dtype=out_dtype, interpret=interpret
    )


def dorefa_gemm_reference(a_codes, w_packed, *, w_bits: int, a_bits: int):
    """Pure-XLA twin using the same integer formulation (bit-exact vs the
    kernel: centered integer code GEMM + identical f32 scale epilogue)."""
    f = 32 // w_bits
    r, n = w_packed.shape
    c_w = packlib.unpack_bitplanes(w_packed, w_bits, r * f)
    n_w = 2**w_bits - 1
    n_a = 2**a_bits - 1
    d = (2 * c_w.astype(jnp.int32) - n_w)
    a = common.pad_dim(a_codes, 1, r * f).astype(jnp.int32)
    acc = (a @ d).astype(jnp.float32)
    return acc * (1.0 / (n_w * n_a))
