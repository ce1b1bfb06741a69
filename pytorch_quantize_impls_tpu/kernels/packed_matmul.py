"""DoReFa k-bit packed GEMM (INT2/INT4/INT8 weights) on the int8 MXU.

Math: DoReFa fake-quant weights lie on the grid ``w_q = (2 c_w - n_w)/n_w``
(codes ``c_w`` in [0, n_w], ``n_w = 2^b - 1``) and activations on
``a_q = c_a/n_a``. Therefore

    y = a_q · w_q = ( 2 * (c_a · c_w) - n_w * rowsum(c_a) ) / (n_a * n_w)

i.e. ONE integer GEMM on the codes plus a per-row affine epilogue — exact,
no dequant multiply inside the loop. Codes are planar-packed (2/4-bit in
uint32 lanes, ``ops.pack.pack_bitplanes``), unpacked in VMEM, MXU-multiplied
as int8. This is the TPU replacement for CUDA "packed sub-byte" tricks:
sub-byte storage in HBM, int8 compute at ~377 TOP/s.
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


def pack_dorefa_weights(wq: jax.Array, bits: int) -> jax.Array:
    """DoReFa fake-quant weights (K, N) -> planar packed codes.

    ``wq`` must already be on the DoReFa grid (output of
    ``ops.dorefa_weight`` with the same ``bits``).
    """
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


def _unpack_codes(p, bits: int):
    """Grouped-planar uint32 tile -> int8 codes (natural K order)."""
    f = 32 // bits
    mask = jnp.uint32(2**bits - 1)
    rows = p.shape[0]
    parts = []
    for g in range(rows // packlib.GROUP_ROWS):
        grp = p[g * packlib.GROUP_ROWS : (g + 1) * packlib.GROUP_ROWS]
        for i in range(f):
            parts.append(((grp >> jnp.uint32(bits * i)) & mask).astype(jnp.int32))
    return jnp.concatenate(parts, axis=0).astype(jnp.int8)


def _kernel(x_ref, w_ref, rows_ref, o_ref, acc_ref, *, n_k, bits, n_w, inv_scale):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_codes(w_ref[:], bits)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        o_ref[:] = (
            (2.0 * acc - float(n_w) * rows_ref[:]) * inv_scale
        ).astype(o_ref.dtype)


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
    # per-row code sum for the affine correction (cheap XLA reduce)
    rowsum = jnp.sum(a_codes.astype(jnp.float32), axis=1, keepdims=True)

    # v5e-tuned (kernel_bench --kernel dorefa): (256, 512, 4096) -> 354 T/s,
    # 11.6x fp32; smaller TM than binary since the f=32/bits unpack writes
    # a larger decoded tile per step.
    if tiles is None:
        tm = min(common.round_up(m, 128), 256)
        tn = min(common.round_up(n, 128), 512)
        tk = min(common.round_up(kp, 128), 4096)
    else:
        tm, tn, tk = tiles
    tk = min(common.round_up(tk, gk), kp)
    mp, np_, kp2 = common.round_up(m, tm), common.round_up(n, tn), common.round_up(kp, tk)
    a_codes = common.pad_dim(common.pad_dim(a_codes, 0, mp), 1, kp2)
    w_packed = common.pad_dim(common.pad_dim(w_packed, 0, kp2 // f), 1, np_)
    rowsum = common.pad_dim(rowsum, 0, mp)

    n_k = kp2 // tk
    grid = (mp // tm, np_ // tn, n_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_k=n_k, bits=w_bits, n_w=n_w, inv_scale=inv_scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tk // f, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
            ),
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
            bytes_accessed=mp * kp2 + kp2 * np_ * w_bits // 8 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_codes, w_packed, rowsum)
    return out[:m, :n]


def dorefa_gemm_reference(a_codes, w_packed, *, w_bits: int, a_bits: int):
    """Pure-XLA twin using the same integer formulation (bit-exact vs the
    kernel: integer code GEMM + identical f32 epilogue)."""
    f = 32 // w_bits
    r, n = w_packed.shape
    c_w = packlib.unpack_bitplanes(w_packed, w_bits, r * f)
    n_w = 2**w_bits - 1
    n_a = 2**a_bits - 1
    a = common.pad_dim(a_codes, 1, r * f).astype(jnp.int32)
    acc = (a @ c_w).astype(jnp.float32)
    rowsum = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
    return (2.0 * acc - float(n_w) * rowsum) * (1.0 / (n_w * n_a))
