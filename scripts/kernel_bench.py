#!/usr/bin/env python
"""Kernel microbenchmark / tile-tuning harness.

Sweeps (TM, TN, TK) candidates for each packed Pallas kernel at the given
shape, against the fp32 and bf16 XLA matmul baselines. Use on the real TPU
to (re)tune ``kernels.common.pick_tiles``; off-TPU it still runs (interpret
mode) but timings are meaningless.

    python scripts/kernel_bench.py --shape 4096 4096 4096 --kernel binary
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def _force(x) -> float:
    return float(jnp.sum(x[:1, :1].astype(jnp.float32)))


def _bench(fn, *args, iters=20, roundtrip=0.0) -> float:
    """Differential timing: time N and 2N dispatch-chains, report
    (T(2N)-T(N))/N. The axon relay adds a large, noisy constant per
    synchronization (~25-60 ms); subtracting a separately-calibrated
    roundtrip is hopeless, but the constant cancels in the difference."""
    del roundtrip
    _force(fn(*args))  # compile + settle

    def run(n: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)  # drop the previous ref: don't hold n x 64MB
        _force(o)
        return time.perf_counter() - t0

    t_n = min(run(iters) for _ in range(3))
    t_2n = min(run(2 * iters) for _ in range(3))
    return max((t_2n - t_n) / iters, 1e-9)


def _calibrate() -> float:
    s = jnp.zeros((2, 2), jnp.float32)
    _force(s)
    return min(
        (lambda t0: (_force(s * 1.0001), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(5)
    )


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--shape", nargs=3, type=int, default=[4096, 4096, 4096])
    p.add_argument("--kernel", default="binary",
                   choices=["binary", "binary_ws", "binary_decoded",
                            "dorefa", "shift"])
    p.add_argument("--bits", type=int, default=4, help="dorefa code width")
    p.add_argument("--tm", nargs="*", type=int, default=[256, 512, 1024])
    p.add_argument("--tn", nargs="*", type=int, default=[128, 256, 512])
    p.add_argument("--tk", nargs="*", type=int, default=[1024, 2048, 4096])
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args()

    from pytorch_quantize_impls_tpu import ops
    from pytorch_quantize_impls_tpu.kernels import (
        packed_matmul as pmm,
        shift_matmul as smm,
        xnor_gemm as bgm,
    )

    M, N, K = a.shape
    flops = 2 * M * N * K
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    rt = _calibrate()
    print(f"# device {jax.devices()[0]} relay {rt*1e3:.1f} ms", file=sys.stderr)

    t32 = _bench(
        jax.jit(lambda p_, q_: jnp.dot(p_, q_, precision=jax.lax.Precision.HIGHEST)),
        x, w, iters=a.iters, roundtrip=rt,
    )
    tb16 = _bench(
        jax.jit(lambda p_, q_: jnp.dot(
            p_.astype(jnp.bfloat16), q_.astype(jnp.bfloat16))),
        x, w, iters=a.iters, roundtrip=rt,
    )
    print(f"# fp32 {flops/t32/1e12:.1f} T/s   bf16 {flops/tb16/1e12:.1f} T/s",
          file=sys.stderr)

    if a.kernel == "binary":
        xi = bgm.binarize_to_int8(x)
        wp = bgm.pack_binary_weights(w)
        alpha = jnp.abs(w).mean(0)
        run = lambda tiles: _bench(
            lambda p_, q_, al: bgm.binary_gemm(p_, q_, al, tiles=tiles),
            xi, wp, alpha, iters=a.iters, roundtrip=rt)
    elif a.kernel == "binary_ws":
        xi = bgm.binarize_to_int8(x)
        wp = bgm.pack_binary_weights(w)
        alpha = jnp.abs(w).mean(0)
        run = lambda tiles: _bench(
            lambda p_, q_, al: bgm.binary_gemm_ws(p_, q_, al, tiles=tiles),
            xi, wp, alpha, iters=a.iters, roundtrip=rt)
    elif a.kernel == "binary_decoded":
        from pytorch_quantize_impls_tpu.kernels import int8_matmul as im
        xi = bgm.binarize_to_int8(x)
        w8 = bgm.decode_binary_weights(bgm.pack_binary_weights(w))
        alpha = jnp.abs(w).mean(0)
        run = lambda tiles: _bench(
            lambda p_, q_, al: im.int8_gemm(p_, q_, al, tiles=tiles),
            xi, w8, alpha, iters=a.iters, roundtrip=rt)
    elif a.kernel == "dorefa":
        wq = ops.dorefa_weight(w, a.bits)
        codes = pmm.dorefa_act_to_int8(ops.dorefa_activation(jnp.abs(x), a.bits), a.bits)
        wp = pmm.pack_dorefa_weights(wq, a.bits)
        run = lambda tiles: _bench(
            lambda p_, q_: pmm.dorefa_gemm(
                p_, q_, w_bits=a.bits, a_bits=a.bits, tiles=tiles),
            codes, wp, iters=a.iters, roundtrip=rt)
    else:
        wp = smm.pack_log_weights(w, 1.0, 4)
        run = lambda tiles: _bench(
            lambda p_, q_: smm.shift_gemm(p_, q_, fsr=1.0, bits=4, tiles=tiles),
            x, wp, iters=a.iters, roundtrip=rt)

    results = []
    for tm, tn, tk in itertools.product(a.tm, a.tn, a.tk):
        if tm > M or tn > N or tk > K:
            continue
        try:
            dt = run((tm, tn, tk))
        except Exception as e:  # noqa: BLE001 — tile combos can exceed VMEM
            print(f"# ({tm},{tn},{tk}) failed: {type(e).__name__}", file=sys.stderr)
            continue
        r = {"tiles": [tm, tn, tk], "ms": round(dt * 1e3, 3),
             "tflops_equiv": round(flops / dt / 1e12, 1),
             "vs_fp32": round(t32 / dt, 2), "vs_bf16": round(tb16 / dt, 2)}
        results.append(r)
        print(json.dumps(r))

    if results:
        best = max(results, key=lambda r: r["tflops_equiv"])
        print(json.dumps({"best": best, "kernel": a.kernel, "shape": a.shape}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
