#!/usr/bin/env python
"""Width-16 ResNet occupancy evidence (VERDICT r4 #5).

The BASELINE DoReFa ResNet-20 is width 16: its conv shapes put N = cout in
{16, 32, 64} against the MXU's 128-wide output tile, so the systolic array
runs at N/128 occupancy REGARDLESS of operand precision — the int8 path's
2x raw-peak advantage survives, but both paths' ceilings collapse by the
same occupancy factor while the model's fp32 glue (BN, residual adds,
pooling) does not shrink, so Amdahl pins the end-to-end ratio near 1 at
width 16. This script turns that claim into numbers: measured packed-int8
and bf16 conv rates at every ResNet-20 stage shape for widths 16 and 64,
against their occupancy-scaled ceilings.

    ceiling(dtype, N) = peak(dtype) * min(N, 128) / 128

peaks are MEASURED on this chip by bench.py (BENCH_TPU_LAST_GOOD.json
detail: int8 ~382 T/s, bf16 ~192 T/s at square 4096 shapes).

Run on TPU:  python scripts/roofline_w16.py  [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

import jax
import jax.numpy as jnp

from perf_bench import make_chained_bench  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--out", default=None, help="append markdown rows here")
    a = p.parse_args()

    from pytorch_quantize_impls_tpu.kernels.conv import (
        pack_conv_weights, packed_conv2d,
    )
    from pytorch_quantize_impls_tpu.ops.dorefa import (
        dorefa_activation, dorefa_weight,
    )

    # measured square-peak reference (live hardware record)
    peaks = {"int8": 382.0, "bf16": 192.0}
    rec = Path("BENCH_TPU_LAST_GOOD.json")
    if rec.exists():
        det = json.loads(rec.read_text()).get("detail_tflops", {})
        peaks["int8"] = det.get("int8_peak", peaks["int8"])
        peaks["bf16"] = det.get("bf16_peak", peaks["bf16"])

    cb = make_chained_bench(repeats=a.repeats)
    rng = np.random.default_rng(0)
    lines = []
    # ResNet-20 stage shapes at widths 16 (BASELINE) and 64 (production)
    for width in (16, 64):
        shapes = [
            (256, 32, 32, width, width),
            (256, 16, 16, 2 * width, 2 * width),
            (256, 8, 8, 4 * width, 4 * width),
        ]
        for b, h, w_, cin, cout in shapes:
            x = jnp.asarray(rng.normal(size=(b, h, w_, cin)).astype(np.float32))
            k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
            flops = 2 * b * h * w_ * 9 * cin * cout
            occ = min(cout, 128) / 128.0

            pd = pack_conv_weights(
                dorefa_weight(k, 4), "dorefa", w_bits=4, a_bits=4
            )
            xd = dorefa_activation(jnp.abs(x), 4)
            t_i8, s_i8 = cb(lambda a_, pw=pd: packed_conv2d(a_, pw), xd)

            def bf16conv(a_, kk):
                return jax.lax.conv_general_dilated(
                    a_.astype(jnp.bfloat16), kk.astype(jnp.bfloat16),
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )

            t_bf, s_bf = cb(bf16conv, x, k)

            r_i8, r_bf = flops / t_i8 / 1e12, flops / t_bf / 1e12
            c_i8, c_bf = peaks["int8"] * occ, peaks["bf16"] * occ
            line = (
                f"| w{width} {b}x{h}x{w_}x{cin}->{cout} | occ {occ:.0%} "
                f"| int8 {r_i8:.1f} T/s = {r_i8 / c_i8:.0%} of {c_i8:.0f} ceil "
                f"(±{s_i8 * 100:.0f}%) "
                f"| bf16 {r_bf:.1f} T/s = {r_bf / c_bf:.0%} of {c_bf:.0f} ceil "
                f"(±{s_bf * 100:.0f}%) |"
            )
            lines.append(line)
            print(line, flush=True)

    if a.out:
        with open(a.out, "a") as f:
            f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
