"""Tiled int8 MXU matmul with fused scale epilogue.

The serving fast path for decoded ±1 binary weights (and any int8-code
GEMM): XLA's ``jnp.dot`` lowers int8×int8→int32 poorly on v5e (~36 T/s
measured — it widens through fp32), while a straight Pallas tiling of the
same product runs the MXU at its native int8 rate. Used by
``xnor_gemm.binary_gemm_decoded`` (SURVEY.md §3.5 eval seam).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_quantize_impls_tpu.kernels import common


def _kernel(x_ref, w_ref, alpha_ref, row_ref, o_ref, acc_ref, *, n_k: int,
            use_alpha: bool, use_row: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        if use_alpha:
            acc = acc * alpha_ref[:]
        if use_row:
            acc = acc * row_ref[:]
        o_ref[:] = acc.astype(o_ref.dtype)


def pick_tiles_int8(m: int, n: int, k: int):
    """int8 tiles, tuned on v5e (scripts/kernel_bench.py --kernel
    binary_decoded, differential timing): deep K tiles win — (512, 256,
    4096) ran 356 T/s = 90% of the 394 TOP/s int8 peak, 11.5x fp32."""
    tm = min(common.round_up(m, 128), 512)
    tn = min(common.round_up(n, 128), 256)
    tk = min(common.round_up(k, 128), 4096)
    return tm, tn, tk


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret", "tiles")
)
def int8_gemm(
    x_i8: jax.Array,
    w_i8: jax.Array,
    alpha: Optional[jax.Array] = None,
    row_scale: Optional[jax.Array] = None,
    *,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    tiles=None,
):
    """(M,K) int8 @ (K,N) int8 -> (M,N) out_dtype, int32 accumulate.

    ``alpha``: (N,) per-out-channel f32 scale; ``row_scale``: (M,) per-row
    f32 scale — both fused into the epilogue.
    """
    if interpret is None:
        interpret = common.use_interpret()
    m, k = x_i8.shape
    k2, n = w_i8.shape
    assert k == k2, (k, k2)

    tm, tn, tk = tiles or pick_tiles_int8(m, n, k)
    mp = common.round_up(m, tm)
    np_ = common.round_up(n, tn)
    kp = common.round_up(k, tk)
    x_i8 = common.pad_dim(common.pad_dim(x_i8, 0, mp), 1, kp)
    w_i8 = common.pad_dim(common.pad_dim(w_i8, 0, kp), 1, np_)

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

    n_k = kp // tk
    grid = (mp // tm, np_ // tn, n_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_k=n_k, use_alpha=use_alpha, use_row=use_row
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
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
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_i8, w_i8, a2, r2)
    return out[:m, :n]


def int8_gemm_reference(x_i8, w_i8, alpha=None, row_scale=None):
    """Pure-XLA twin (parity tests)."""
    out = (x_i8.astype(jnp.int32) @ w_i8.astype(jnp.int32)).astype(jnp.float32)
    if alpha is not None:
        out = out * alpha.reshape(1, -1)
    if row_scale is not None:
        out = out * row_scale.reshape(-1, 1)
    return out
