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
    _alive = False
    for _attempt in range(3):
        if _tpu_alive():
            _alive = True
            break
        # The axon relay wedges transiently (observed: minutes to ~2h);
        # short wedges often clear, so wait and re-probe before giving up
        # the chip for a whole driver round.
        print(f"# TPU probe {_attempt + 1}/3 failed; waiting 120s",
              file=sys.stderr)
        time.sleep(120)
    if not _alive:
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


def _bench_samples(fn, *args, repeats: int = 0) -> list:
    """Per-repeat seconds/iteration (device time), differential:
    (T(2N)-T(N))/N.

    The relay adds a large noisy constant per synchronization; it cancels
    in the difference (separately-calibrated subtraction does not work).
    Returns ``repeats`` independent estimates so callers can report median
    AND spread (VERDICT r2 #6: a single estimate hid a 5% run-to-run drift).

    NOTE (r4): the on-device fori_loop chain used by perf_bench's MODEL
    measurements is deliberately NOT used here. A single-GEMM chain needs a
    data dependency on the output, and any cheap one is unsound or unfair:
    a tiny slice (``y[:1, :1]``) lets XLA dead-code-eliminate the plain-dot
    baselines down to one row x column (measured: "4340 TFLOP/s fp32" —
    Pallas custom calls can't be sliced, so only the baselines collapsed,
    corrupting every ratio), while a full ``sum(y)`` fuses free into a dot
    epilogue but forces an extra 2-pass HBM round-trip on custom-call
    outputs, penalizing exactly the kernels under test. Whole models don't
    have this problem (tiny logits, deep internal dependency). So kernel
    rates keep the Python-dispatch differential with auto-scaled windows."""
    if not repeats:
        repeats = 5 if _CPU_FALLBACK else 7
    _force(fn(*args))  # compile + settle

    def run(n: int) -> float:
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)  # drop the previous ref: don't hold n x 64MB
        _force(o)
        return time.perf_counter() - t0

    n = ITERS
    est = max((run(2 * n) - run(n)) / n, 1e-9)  # pilot
    # Auto-scale the differential window: fixed N=50 gives ~20-200 ms
    # chains whose difference rides the relay constant's jitter (the
    # BENCH_r01->r02 "5% drift" was exactly this).
    # r5 (TPU only): 0.5 s windows + 7 repeats — the r4 driver run carried
    # ±48%/±191% on the secondary (ws/decoded) rows with 0.25 s windows;
    # doubling the window halves the relay-jitter share and the extra
    # repeats stabilize the median (VERDICT r4 #8). The CPU fallback keeps
    # the smaller budget (its GEMMs are seconds each).
    window = 0.25 if _CPU_FALLBACK else 0.5
    n = min(max(n, int(window / est)), 4000)

    ests = []
    for _ in range(repeats):
        t_n = run(n)
        t_2n = run(2 * n)
        ests.append(max((t_2n - t_n) / n, 1e-9))
    return ests


def _bench(fn, *args, roundtrip: float = 0.0):
    """Median seconds/iteration + relative spread ((max-min)/median)."""
    del roundtrip
    ests = sorted(_bench_samples(fn, *args))
    med = ests[len(ests) // 2]
    return med, (ests[-1] - ests[0]) / med


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
    t_f32, s_f32 = _bench(f32, x, w)
    print(f"# fp32 HIGHEST: {t_f32*1e3:.3f} ms  {FLOPS/t_f32/1e12:.1f} TFLOP/s "
          f"(±{s_f32*100:.0f}%)", file=sys.stderr)
    # Secondary baseline: XLA default f32 (bf16 passes on TPU). This is the
    # measured bf16 "speed of light" the decoded/shift paths roofline against.
    f32d = jax.jit(lambda a, b: jnp.dot(a, b))
    t_bf16, s_bf16 = _bench(f32d, x, w)
    print(f"# bf16 peak (f32 default): {t_bf16*1e3:.3f} ms  "
          f"{FLOPS/t_bf16/1e12:.1f} TFLOP/s (±{s_bf16*100:.0f}%)", file=sys.stderr)
    # Measured int8 MXU peak: plain int8 matmul, int32 accumulate — the
    # speed-of-light for every integer-code quantized GEMM below
    # (SURVEY.md §5 profiling row: per-kernel roofline, not just x-vs-fp32).
    i8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    )
    xi8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wi8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    t_i8, s_i8 = _bench(i8, xi8, wi8)
    print(f"# int8 peak: {t_i8*1e3:.3f} ms  {FLOPS/t_i8/1e12:.1f} TOP/s "
          f"(±{s_i8*100:.0f}%)", file=sys.stderr)

    def report(label, t, spread, peak_t, peak_name):
        print(
            f"# {label} {t*1e3:.3f} ms  {FLOPS/t/1e12:.1f} T/s "
            f"({t_f32/t:.1f}x fp32, {peak_t/t*100:.0f}% of {peak_name} peak, "
            f"±{spread*100:.0f}%)",
            file=sys.stderr,
        )

    # 1-bit fused packed-resident GEMM (headline: weights stay 1-bit in HBM,
    # 32x memory saving, unpack fused in VMEM, int8 MXU compute).
    xi = bgm.binarize_to_int8(x)
    wp = bgm.pack_binary_weights(w)
    alpha = jnp.abs(w).mean(0)
    t_bin, s_bin = _bench(lambda a, b, al: bgm.binary_gemm(a, b, al), xi, wp, alpha)
    report("binary fused:  ", t_bin, s_bin, t_i8, "int8")

    # weight-stationary-unpack variant (packed-resident, single unpack/tile).
    t_ws, s_ws = _bench(lambda a, b, al: bgm.binary_gemm_ws(a, b, al), xi, wp, alpha)
    report("binary ws:     ", t_ws, s_ws, t_i8, "int8")

    # decoded int8 serving mode (one-time decode, 4x memory saving).
    w8 = bgm.decode_binary_weights(wp)
    t_dec, s_dec = _bench(lambda a, b, al: bgm.binary_gemm_decoded(a, b, al),
                          xi, w8, alpha)
    report("binary decoded:", t_dec, s_dec, t_i8, "int8")
    if t_ws < t_bin:  # headline: best packed-resident path
        t_bin, s_bin = t_ws, s_ws

    # 4-bit DoReFa packed GEMM.
    wq = ops.dorefa_weight(w, 4)
    aq = ops.dorefa_activation(jnp.abs(x), 4)
    codes = pmm.dorefa_act_to_int8(aq, 4)
    wp4 = pmm.pack_dorefa_weights(wq, 4)
    t_d4, s_d4 = _bench(lambda a, b: pmm.dorefa_gemm(a, b, w_bits=4, a_bits=4),
                        codes, wp4)
    report("dorefa4 packed:", t_d4, s_d4, t_i8, "int8")

    # log-quant shift GEMM (bf16 bit-pattern assembly -> bf16 MXU: its
    # speed-of-light is the bf16 peak, not int8).
    wpl = smm.pack_log_weights(w, 1.0, 4)
    t_log, s_log = _bench(lambda a, b: smm.shift_gemm(a, b, fsr=1.0, bits=4),
                          x, wpl)
    report("log shift:     ", t_log, s_log, t_bf16, "bf16")

    value = FLOPS / t_bin / 1e12
    name = "binary_gemm_tflops_equiv_per_chip_4096"
    if _CPU_FALLBACK:
        name = "binary_gemm_tflops_equiv_CPU_FALLBACK_tpu_unreachable_1024"
    result = {
        "metric": name,
        "value": round(value, 2),
        "unit": "TFLOP-equiv/s",
        "vs_baseline": round(t_f32 / t_bin, 2),
        "spread_pct": round(s_bin * 100, 1),
        "pct_of_int8_peak": round(t_i8 / t_bin * 100, 1),
    }

    # VERDICT r3 #2: the axon relay wedges for hours at a time, and a wedge
    # at round end used to leave the round with only a CPU-fallback number.
    # Persist every successful TPU run to BENCH_TPU_LAST_GOOD.json (committed
    # to the repo) and, on CPU fallback, emit the last-good TPU record inside
    # the same JSON line so a hardware-verified value is never lost.
    last_good_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "BENCH_TPU_LAST_GOOD.json")
    if not _CPU_FALLBACK:
        try:
            commit = subprocess.run(
                ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
                 "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        except Exception:
            commit = "unknown"
        record = dict(result)
        record.update(
            {
                "timestamp_utc": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
                "git_commit": commit,
                "device": str(jax.devices()[0]),
                "detail_tflops": {
                    "fp32_highest": round(FLOPS / t_f32 / 1e12, 2),
                    "bf16_peak": round(FLOPS / t_bf16 / 1e12, 2),
                    "int8_peak": round(FLOPS / t_i8 / 1e12, 2),
                    "binary_fused_best": round(FLOPS / t_bin / 1e12, 2),
                    "binary_decoded": round(FLOPS / t_dec / 1e12, 2),
                    "dorefa4_packed": round(FLOPS / t_d4 / 1e12, 2),
                    "log_shift": round(FLOPS / t_log / 1e12, 2),
                },
            }
        )
        try:
            with open(last_good_path, "w") as f:
                json.dump(record, f, indent=1)
                f.write("\n")
        except OSError as e:  # never let persistence kill the bench line
            print(f"# could not persist last-good record: {e}", file=sys.stderr)
    else:
        try:
            with open(last_good_path) as f:
                lg = json.load(f)
            result["tpu_last_good"] = {
                "value": lg.get("value"),
                "vs_baseline": lg.get("vs_baseline"),
                "pct_of_int8_peak": lg.get("pct_of_int8_peak"),
                "timestamp_utc": lg.get("timestamp_utc"),
                "git_commit": lg.get("git_commit"),
            }
        except (OSError, ValueError):
            print("# no BENCH_TPU_LAST_GOOD.json available", file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
