"""Benchmark: quantized GEMM TFLOP-equiv/s/chip vs fp32 matmul baseline.

North-star metric (BASELINE.json:2): throughput of the true low-bit GEMM
path. Baseline = honest fp32 matmul (``precision=HIGHEST``) at the same
logical shape; BASELINE.json:5 target is >= 8x.

Prints ONE JSON line:
  {"metric": ..., "value": TFLOP-equiv/s, "unit": ..., "vs_baseline": speedup}

Detail lines (all paths) go to stderr. Timing methodology: this image's TPU
is behind an async relay where ``block_until_ready`` returns early, so each
measurement enqueues N iterations and forces completion with one tiny scalar
fetch; the relay round-trip (~30 ms) is calibrated and subtracted.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def _tpu_alive(timeout_s: float = 120.0) -> bool:
    """Probe the TPU in a subprocess — the axon tunnel can wedge in a way
    that hangs any in-process XLA call forever (device enumerates, first
    op never completes), so the probe must be killable."""
    code = (
        "import jax, jax.numpy as jnp;"
        "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__" and not os.environ.get("QTPU_BENCH_NO_PROBE"):
    if not _tpu_alive():
        # Re-exec on CPU so the driver still gets its JSON line. The
        # speedup-vs-fp32 ratio is still meaningful (same machine both
        # sides); absolute TFLOP/s are not TPU numbers — flagged in the
        # metric name.
        print("# TPU unreachable; falling back to CPU", file=sys.stderr)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["QTPU_BENCH_NO_PROBE"] = "1"
        env["QTPU_BENCH_CPU_FALLBACK"] = "1"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax
import jax.numpy as jnp


_CPU_FALLBACK = bool(os.environ.get("QTPU_BENCH_CPU_FALLBACK"))
M = N = K = 1024 if _CPU_FALLBACK else 4096
ITERS = 5 if _CPU_FALLBACK else 50
FLOPS = 2 * M * N * K


def _force(x) -> float:
    return float(jnp.sum(x[:1, :1].astype(jnp.float32)))


def _calibrate_roundtrip() -> float:
    s = jnp.zeros((2, 2), jnp.float32)
    _force(s)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(s * 1.0001)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _bench(fn, *args, roundtrip: float = 0.0) -> float:
    """Seconds per iteration (device time), differential: (T(2N)-T(N))/N.

    The relay adds a large noisy constant per synchronization; it cancels
    in the difference (separately-calibrated subtraction does not work)."""
    del roundtrip
    _force(fn(*args))  # compile + settle

    def run(n: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)  # drop the previous ref: don't hold n x 64MB
        _force(o)
        return time.perf_counter() - t0

    t_n = min(run(ITERS) for _ in range(3))
    t_2n = min(run(2 * ITERS) for _ in range(3))
    return max((t_2n - t_n) / ITERS, 1e-9)


def main() -> None:
    import pytorch_quantize_impls_tpu.kernels  # noqa: F401

    bgm = sys.modules["pytorch_quantize_impls_tpu.kernels.xnor_gemm"]
    pmm = sys.modules["pytorch_quantize_impls_tpu.kernels.packed_matmul"]
    smm = sys.modules["pytorch_quantize_impls_tpu.kernels.shift_matmul"]
    from pytorch_quantize_impls_tpu import ops

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))

    rt = _calibrate_roundtrip()
    print(f"# relay roundtrip {rt*1e3:.1f} ms on {jax.devices()[0]}", file=sys.stderr)

    # Baseline: honest fp32 matmul.
    f32 = jax.jit(
        lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
    )
    t_f32 = _bench(f32, x, w, roundtrip=rt)
    print(f"# fp32 HIGHEST: {t_f32*1e3:.3f} ms  {FLOPS/t_f32/1e12:.1f} TFLOP/s",
          file=sys.stderr)
    # Secondary baseline: XLA default f32 (bf16 passes on TPU).
    f32d = jax.jit(lambda a, b: jnp.dot(a, b))
    t_f32d = _bench(f32d, x, w, roundtrip=rt)
    print(f"# fp32 default: {t_f32d*1e3:.3f} ms  {FLOPS/t_f32d/1e12:.1f} TFLOP/s",
          file=sys.stderr)

    # 1-bit fused packed-resident GEMM (headline: weights stay 1-bit in HBM,
    # 32x memory saving, unpack fused in VMEM, int8 MXU compute).
    xi = bgm.binarize_to_int8(x)
    wp = bgm.pack_binary_weights(w)
    alpha = jnp.abs(w).mean(0)
    t_bin = _bench(lambda a, b, al: bgm.binary_gemm(a, b, al), xi, wp, alpha,
                   roundtrip=rt)
    print(f"# binary fused:   {t_bin*1e3:.3f} ms  {FLOPS/t_bin/1e12:.1f} T/s "
          f"({t_f32/t_bin:.1f}x fp32)", file=sys.stderr)

    # weight-stationary-unpack variant (packed-resident, single unpack/tile).
    t_ws = _bench(lambda a, b, al: bgm.binary_gemm_ws(a, b, al), xi, wp, alpha,
                  roundtrip=rt)
    print(f"# binary ws:      {t_ws*1e3:.3f} ms  {FLOPS/t_ws/1e12:.1f} T/s "
          f"({t_f32/t_ws:.1f}x fp32)", file=sys.stderr)

    # decoded int8 serving mode (one-time decode, 4x memory saving).
    w8 = bgm.decode_binary_weights(wp)
    t_dec = _bench(
        lambda a, b, al: bgm.binary_gemm_decoded(a, b, al), xi, w8, alpha,
        roundtrip=rt,
    )
    print(f"# binary decoded: {t_dec*1e3:.3f} ms  {FLOPS/t_dec/1e12:.1f} T/s "
          f"({t_f32/t_dec:.1f}x fp32)", file=sys.stderr)
    t_bin = min(t_bin, t_ws)  # headline: best packed-resident path

    # 4-bit DoReFa packed GEMM.
    wq = ops.dorefa_weight(w, 4)
    aq = ops.dorefa_activation(jnp.abs(x), 4)
    codes = pmm.dorefa_act_to_int8(aq, 4)
    wp4 = pmm.pack_dorefa_weights(wq, 4)
    t_d4 = _bench(
        lambda a, b: pmm.dorefa_gemm(a, b, w_bits=4, a_bits=4), codes, wp4,
        roundtrip=rt,
    )
    print(f"# dorefa4 packed: {t_d4*1e3:.3f} ms  {FLOPS/t_d4/1e12:.1f} T/s "
          f"({t_f32/t_d4:.1f}x fp32)", file=sys.stderr)

    # log-quant shift GEMM.
    wpl = smm.pack_log_weights(w, 1.0, 4)
    t_log = _bench(
        lambda a, b: smm.shift_gemm(a, b, fsr=1.0, bits=4), x, wpl,
        roundtrip=rt,
    )
    print(f"# log shift:      {t_log*1e3:.3f} ms  {FLOPS/t_log/1e12:.1f} T/s "
          f"({t_f32/t_log:.1f}x fp32)", file=sys.stderr)

    value = FLOPS / t_bin / 1e12
    name = "binary_gemm_tflops_equiv_per_chip_4096"
    if _CPU_FALLBACK:
        name = "binary_gemm_tflops_equiv_CPU_FALLBACK_tpu_unreachable_1024"
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(value, 2),
                "unit": "TFLOP-equiv/s",
                "vs_baseline": round(t_f32 / t_bin, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
