#!/usr/bin/env python
"""Probe raw MXU throughput by dtype through a minimal Pallas matmul.

Answers one design question (kernels/__init__ docstring): at which operand
dtype does the MXU peak on this chip, and does Mosaic lower int8xint8->int32
natively? Run on the real TPU; prints one line per dtype.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=acc_ref.dtype
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tiles", "acc_dtype"))
def pallas_mm(x, w, *, tiles=(512, 512, 2048), acc_dtype=jnp.float32):
    m, k = x.shape
    _, n = w.shape
    tm, tn, tk = tiles
    n_k = k // tk
    return pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k, out_dtype=jnp.float32),
        grid=(m // tm, n // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, w)


def bench(fn, *args, iters=200):
    o = fn(*args)
    float(jnp.sum(o[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    float(jnp.sum(o[:1, :1]))
    return (time.perf_counter() - t0) / iters


def main():
    M = N = K = 4096
    flops = 2 * M * N * K
    rng = np.random.default_rng(0)
    xf = rng.normal(size=(M, K)).astype(np.float32)
    wf = rng.normal(size=(K, N)).astype(np.float32)
    cases = [
        ("bf16/f32acc", jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16), jnp.float32),
        ("int8/i32acc", jnp.asarray(rng.integers(-4, 4, (M, K)), jnp.int8),
         jnp.asarray(rng.integers(-4, 4, (K, N)), jnp.int8), jnp.int32),
    ]
    try:  # int4 arrays fail to construct on some backends (axon relay)
        cases.append(
            ("int4/i32acc",
             jnp.asarray(rng.integers(-4, 4, (M, K)).astype(np.int8)).astype(jnp.int4),
             jnp.asarray(rng.integers(-4, 4, (K, N)).astype(np.int8)).astype(jnp.int4),
             jnp.int32)
        )
    except Exception as e:  # noqa: BLE001
        print(f"int4 construction failed: {type(e).__name__}", flush=True)
    for tiles in [(512, 512, 2048), (256, 1024, 4096), (1024, 512, 2048), (512, 256, 4096)]:
        for name, x, w, acc in cases:
            try:
                dt = bench(functools.partial(pallas_mm, tiles=tiles, acc_dtype=acc), x, w)
                print(f"{name} tiles={tiles}: {dt*1e3:.3f} ms {flops/dt/1e12:.0f} T/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} tiles={tiles}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
