"""Tensor-parallel packed matmuls with explicit, overlappable collectives.

Megatron-style TP over the mesh "model" axis, shard_map-explicit so the
collectives decompose into ring steps XLA can overlap with the per-chunk
matmuls (async collective-permute + latency-hiding scheduler), per
BASELINE.json:5 "all-gather/reduce-scatter collectives overlapped with the
packed-matmul compute":

* ``column_parallel_dense``: W col-sharded (out-features), x replicated on
  the model axis -> local packed GEMM, NO comm (output stays sharded).
* ``row_parallel_dense``: W row-sharded (in-features), x feature-sharded ->
  ring reduce-scatter of partial products overlapped with chunked local
  matmul; each device ends with its M-shard of the full output.
* ``allgather_matmul``: x M-sharded on the model axis, W replicated-local;
  the all-gather of x rides the ring one chunk per step, each chunk's
  matmul overlapping the next permute.

Packing discipline: column-sharding packed weights is free (packing runs
along K); row-sharding must cut on ``ops.pack.planar_group_k`` boundaries —
``shard_packed_rows`` enforces this.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pytorch_quantize_impls_tpu.parallel.mesh import MODEL_AXIS


def _ring_perm(axis_name):
    n = jax.lax.axis_size(axis_name)
    return [(j, (j + 1) % n) for j in range(n)]


def allgather_matmul(x_local, w, axis_name: str = MODEL_AXIS):
    """``allgather(x, axis) @ w`` with the gather overlapped chunk-by-chunk.

    Call INSIDE shard_map. x_local: this device's M-shard (Mc, K); w: local
    weights (K, N) (replicated or column shard). Returns (Mc * n, N): the
    full M rows (for w column shards: this device's N-columns of them).
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    mc = x_local.shape[0]
    out = jnp.zeros((mc * n, w.shape[1]), jnp.result_type(x_local, w))

    def write(out, rows, src_idx):
        return jax.lax.dynamic_update_slice(out, rows, (src_idx * mc, 0))

    chunk = x_local
    out = write(out, chunk @ w, i)
    for t in range(1, n):
        # send current chunk to the right neighbor; after t hops we hold the
        # chunk of device (i - t). The permute is independent of this step's
        # matmul, so XLA overlaps them.
        chunk = jax.lax.ppermute(chunk, axis_name, _ring_perm(axis_name))
        src = (i - t) % n
        out = write(out, chunk @ w, src)
    return out


def matmul_reducescatter(x, w_local, axis_name: str = MODEL_AXIS):
    """``reduce_scatter(x @ W, axis)`` with the reduction ring overlapped.

    Call INSIDE shard_map. x: (M, K_local) — this device's K-shard of the
    activations; w_local: (K_local, N) row shard. Every device contributes a
    partial product for all M rows; the ring accumulates so device i ends
    with rows [i*Mc, (i+1)*Mc) of the REDUCED output (Mc = M // n).
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    m = x.shape[0]
    mc = m // n

    def partial(c):
        rows = jax.lax.dynamic_slice(x, (c * mc, 0), (mc, x.shape[1]))
        return rows @ w_local

    # Each buffer carries ONE chunk identity around the ring: the buffer
    # starting at device j carries chunk (j - 1); after t hops device i holds
    # the buffer originated at (i - t), i.e. chunk (i - t - 1), and adds its
    # own partial for that chunk. After n-1 hops device i holds chunk i,
    # fully reduced. Each step's partial matmul is independent of the
    # in-flight permute, so XLA overlaps them.
    buf = partial((i - 1) % n)
    for t in range(1, n):
        buf = jax.lax.ppermute(buf, axis_name, _ring_perm(axis_name))
        buf = buf + partial((i - t - 1) % n)
    return buf  # rows of chunk i, fully reduced


def shard_packed_rows(packed, n_shards: int, group_k: int):
    """Split grouped-planar packed weights along K into TP row-shards.

    Shard boundaries must land on group boundaries (``group_k`` K-rows =
    ``group_k // (32 // bits)`` packed rows) so each shard decodes
    independently.
    """
    r = packed.shape[0]
    if r % n_shards:
        raise ValueError(f"{r} packed rows not divisible by {n_shards} shards")
    rows_per = r // n_shards
    # r is in packed rows; groups are GROUP_ROWS=32 packed rows
    if rows_per % 32:
        raise ValueError(
            f"shard of {rows_per} packed rows splits a 32-row group; pad K "
            f"to a multiple of {n_shards} * {group_k}"
        )
    return packed.reshape(n_shards, rows_per, packed.shape[1])


def tp_binary_dense(
    x,
    w8,  # decoded ±1 int8 (K, N), to be column-sharded
    alpha: Optional[jax.Array],
    mesh: Mesh,
    *,
    gather_output: bool = True,
):
    """Column-parallel binary dense over the mesh model axis.

    x replicated on 'model' (sharded on 'data' as usual); w8 column-sharded.
    Local compute is the int8 MXU GEMM; the optional output all-gather is the
    only collective.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(None, MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=P(None, MODEL_AXIS) if not gather_output else P(None, None),
        check_vma=False,
    )
    def f(x, w_local, a_local):
        y = jnp.dot(x, w_local, preferred_element_type=jnp.int32).astype(
            jnp.float32
        )
        if alpha is not None:
            y = y * a_local[None, :]
        if gather_output:
            y = jax.lax.all_gather(y, MODEL_AXIS, axis=1, tiled=True)
        return y

    a = alpha if alpha is not None else jnp.ones((w8.shape[1],), jnp.float32)
    return f(x, w8, a)
