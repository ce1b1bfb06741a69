"""XNOR/binary GEMM: 1-bit packed weights, int8 MXU, fused scale epilogue.

Replaces the reference's fp32 ``F.linear`` over ±1-valued fp32 tensors
(SURVEY.md §3.1 hot loop). TPU-native design (see kernels/__init__):

    HBM:  x int8 (M,K)  [±1]        w uint32 (K/32, N) planar 1-bit
    VMEM: unpack w tile -> ±1 int8 via shift+mask+concat (VPU)
    MXU:  int8 x int8 -> int32 accumulate
    VPU epilogue: out = acc * alpha[n] (* row_scale[m])  -> out dtype

``alpha`` is the XNOR per-out-channel scale, ``row_scale`` the XNOR input
K-map column (both optional, fused free into the epilogue). The binary dot
identity ``a·b = K - 2*popcount(a XOR b)`` is NOT used: on TPU the MXU int8
path (~377 TOP/s measured) beats any VPU popcount formulation (~40 Top/s
ceiling) while planar 1-bit storage keeps the 32x HBM saving.
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


def pack_binary_weights(w: jax.Array) -> jax.Array:
    """±1-ish fp weights (K, N) -> planar 1-bit uint32 (ceil(K/32), N).

    Uses ``sign(w) >= 0 -> 1`` (matches ``ops.safe_sign``). K is zero-padded;
    padded rows decode to -1 but multiply against zero-padded activations.
    """
    return packlib.pack_bitplanes((w >= 0).astype(jnp.int32), 1)


def binarize_to_int8(x: jax.Array) -> jax.Array:
    """fp activations -> ±1 int8 (the BNN activation binarization)."""
    return jnp.where(x >= 0, 1, -1).astype(jnp.int8)


def _unpack_pm1(p):
    """Grouped-planar uint32 tile -> ±1 int8 in natural K order.

    (Computed in int32: Mosaic has no i8 vector multiply.) Each 32-row group
    is self-contained — see ``ops.pack`` layout notes.
    """
    rows = p.shape[0]
    parts = []
    for g in range(rows // packlib.GROUP_ROWS):
        grp = p[g * packlib.GROUP_ROWS : (g + 1) * packlib.GROUP_ROWS]
        for i in range(32):
            b = ((grp >> jnp.uint32(i)) & jnp.uint32(1)).astype(jnp.int32)
            parts.append(2 * b - 1)
    return jnp.concatenate(parts, axis=0).astype(jnp.int8)


def _kernel(x_ref, w_ref, alpha_ref, row_ref, o_ref, acc_ref, *, n_k: int,
            use_alpha: bool, use_row: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_pm1(w_ref[:])
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        if use_alpha:
            acc = acc * alpha_ref[:]
        if use_row:
            acc = acc * row_ref[:]
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "tiles")
)
def binary_gemm(
    x_i8: jax.Array,
    w_packed: jax.Array,
    alpha: Optional[jax.Array] = None,
    row_scale: Optional[jax.Array] = None,
    *,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    tiles=None,
):
    """(M,K) int8 ±1 @ planar-1-bit (K/32,N) -> (M,N) out_dtype.

    ``alpha``: (N,) per-out-channel scale; ``row_scale``: (M,) per-row scale.
    K as seen by ``x_i8`` may be un-padded; it is zero-padded here to the
    packed K (32-multiple).
    """
    if interpret is None:
        interpret = common.use_interpret()
    gk = packlib.planar_group_k(1)  # 1024: K-tile granule of the layout
    m, k = x_i8.shape
    r, n = w_packed.shape
    kp = r * 32
    assert k <= kp and kp % gk == 0, (k, kp)
    x_i8 = common.pad_dim(x_i8, 1, kp)

    tm, tn, tk = tiles or common.pick_tiles(m, n, kp)
    tk = min(common.round_up(tk, gk), kp)
    mp, np_, kp2 = common.round_up(m, tm), common.round_up(n, tn), common.round_up(kp, tk)
    x_i8 = common.pad_dim(common.pad_dim(x_i8, 0, mp), 1, kp2)
    w_packed = common.pad_dim(common.pad_dim(w_packed, 0, kp2 // 32), 1, np_)

    use_alpha = alpha is not None
    use_row = row_scale is not None
    a2 = (
        common.pad_dim(alpha.astype(jnp.float32).reshape(1, n), 1, np_)
        if use_alpha
        else jnp.zeros((1, np_), jnp.float32)
    )
    r2 = (
        common.pad_dim(row_scale.astype(jnp.float32).reshape(m, 1), 0, mp)
        if use_row
        else jnp.zeros((mp, 1), jnp.float32)
    )

    n_k = kp2 // tk
    grid = (mp // tm, np_ // tn, n_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_k=n_k, use_alpha=use_alpha, use_row=use_row
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tk // 32, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
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
            bytes_accessed=mp * kp2 + kp2 * np_ // 8 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_i8, w_packed, a2, r2)
    return out[:m, :n]


def _ws_kernel(x_ref, w_ref, alpha_ref, row_ref, o_ref, acc_ref, wdec_ref, *,
               n_k: int, n_i: int, tm: int, use_alpha: bool, use_row: bool):
    """Weight-stationary-unpack kernel body: grid (j, k, i), i innermost.

    Each packed w tile (k, j) is unpacked ONCE (at i == 0) into the wdec
    VMEM scratch and reused by every M-tile; the accumulator is a full
    (n_i*tm, tn) strip so all M-tiles' partial sums persist across k.
    """
    k = pl.program_id(1)
    i = pl.program_id(2)
    rows = pl.ds(i * tm, tm)

    @pl.when(i == 0)
    def _():
        wdec_ref[:] = _unpack_pm1(w_ref[:])

    @pl.when(k == 0)
    def _():
        acc_ref[rows, :] = jnp.zeros((tm, acc_ref.shape[1]), jnp.int32)

    acc_ref[rows, :] += jnp.dot(
        x_ref[:], wdec_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[rows, :].astype(jnp.float32)
        if use_alpha:
            acc = acc * alpha_ref[:]
        if use_row:
            acc = acc * row_ref[:]
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "tiles")
)
def binary_gemm_ws(
    x_i8: jax.Array,
    w_packed: jax.Array,
    alpha: Optional[jax.Array] = None,
    row_scale: Optional[jax.Array] = None,
    *,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    tiles=None,
):
    """Packed-resident binary GEMM with single unpack per weight tile.

    Same contract as :func:`binary_gemm`; faster when M is large enough
    that re-unpacking weights per M-tile dominates (the default kernel
    unpacks each (k, j) tile M/TM times; this one, once).
    """
    if interpret is None:
        interpret = common.use_interpret()
    gk = packlib.planar_group_k(1)
    m, k = x_i8.shape
    r, n = w_packed.shape
    kp = r * 32
    assert k <= kp and kp % gk == 0, (k, kp)
    x_i8 = common.pad_dim(x_i8, 1, kp)

    # v5e-tuned default (kernel_bench --kernel binary_ws): 272 T/s, 8.7x fp32
    tm, tn, tk = tiles or (256, 512, 2048)
    tn = min(common.round_up(n, 128), tn)
    tk = min(common.round_up(tk, gk), kp)
    mp, np_, kp2 = common.round_up(m, tm), common.round_up(n, tn), common.round_up(kp, tk)
    x_i8 = common.pad_dim(common.pad_dim(x_i8, 0, mp), 1, kp2)
    w_packed = common.pad_dim(common.pad_dim(w_packed, 0, kp2 // 32), 1, np_)

    use_alpha = alpha is not None
    use_row = row_scale is not None
    a2 = (
        common.pad_dim(alpha.astype(jnp.float32).reshape(1, n), 1, np_)
        if use_alpha
        else jnp.zeros((1, np_), jnp.float32)
    )
    r2 = (
        common.pad_dim(row_scale.astype(jnp.float32).reshape(m, 1), 0, mp)
        if use_row
        else jnp.zeros((mp, 1), jnp.float32)
    )

    n_k = kp2 // tk
    n_i = mp // tm
    grid = (np_ // tn, n_k, n_i)
    out = pl.pallas_call(
        functools.partial(
            _ws_kernel, n_k=n_k, n_i=n_i, tm=tm,
            use_alpha=use_alpha, use_row=use_row,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda j, k, i: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tk // 32, tn), lambda j, k, i: (k, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tn), lambda j, k, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda j, k, i: (i, 0), memory_space=pltpu.VMEM),
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
            bytes_accessed=mp * kp2 * (np_ // tn) + kp2 * np_ // 8 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_i8, w_packed, a2, r2)
    return out[:m, :n]


def _decode_kernel(p_ref, o_ref):
    o_ref[:] = _unpack_pm1(p_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_binary_weights(w_packed: jax.Array, *, interpret=None) -> jax.Array:
    """Planar 1-bit (K/32, N) -> ±1 int8 (K, N): the one-time decode pass.

    Serving keeps hot weights decoded (int8, still 4x smaller than f32) and
    cold/TP-resident weights packed; measured ~0.23 ms for 4096x4096 on v5e
    (bandwidth-bound: reads 2 MB, writes 16 MB).
    """
    if interpret is None:
        interpret = common.use_interpret()
    r, n = w_packed.shape
    k = r * 32
    tk = min(k, 2048)
    tn = min(common.round_up(n, 128), 1024)
    # K must be padded to the tile grid: k // tk floor-division silently
    # dropped the last partial K-tile (e.g. K=2304 decoded only 2048 rows —
    # the conv cin=256 divergence found in r3).
    kp = common.round_up(k, tk)
    np_ = common.round_up(n, tn)
    w_packed = common.pad_dim(common.pad_dim(w_packed, 0, kp // 32), 1, np_)
    out = pl.pallas_call(
        _decode_kernel,
        grid=(kp // tk, np_ // tn),
        in_specs=[
            pl.BlockSpec((tk // 32, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tk, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, np_), jnp.int8),
        interpret=interpret,
    )(w_packed)
    return out[:k, :n]


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def binary_gemm_decoded(
    x_i8: jax.Array,
    w_i8: jax.Array,
    alpha: Optional[jax.Array] = None,
    row_scale: Optional[jax.Array] = None,
    *,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
):
    """Weight-stationary fast path: pre-decoded ±1 int8 weights through the
    Pallas tiled int8 GEMM (XLA's own int8 dot widens through fp32 on v5e
    and lands ~10x slower). Use for compute-bound shapes / serving steady
    state; weights stay 4x smaller than f32."""
    from pytorch_quantize_impls_tpu.kernels import int8_matmul

    k = w_i8.shape[0]
    x_i8 = common.pad_dim(x_i8, 1, k)
    return int8_matmul.int8_gemm(
        x_i8, w_i8, alpha, row_scale, out_dtype=out_dtype, interpret=interpret
    )


def binary_gemm_reference(x_i8, w_packed, alpha=None, row_scale=None):
    """Pure-XLA twin of :func:`binary_gemm` (parity tests, CPU fallback)."""
    r, n = w_packed.shape
    w = packlib.unpack_bitplanes(w_packed, 1, r * 32)
    w = (2 * w - 1).astype(jnp.float32)
    x = common.pad_dim(x_i8, 1, r * 32).astype(jnp.float32)
    out = x @ w
    if alpha is not None:
        out = out * alpha.reshape(1, n)
    if row_scale is not None:
        out = out * row_scale.reshape(-1, 1)
    return out
