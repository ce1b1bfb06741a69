"""Shared kernel utilities: backend detection, tiling, padding."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def use_interpret() -> bool:
    """Pallas interpret mode off-TPU (CI runs on CPU; axon == real TPU)."""
    platform = jax.default_backend()
    return platform not in ("tpu", "axon")


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_dim(x, axis: int, to: int):
    """Zero-pad ``axis`` of x up to length ``to``."""
    n = x.shape[axis]
    if n == to:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, to - n)
    return jnp.pad(x, pads)


def pick_tiles(m: int, n: int, k: int) -> Tuple[int, int, int]:
    """Default (TM, TN, TK) tiling, tuned on v5e with differential timing
    (scripts/kernel_bench.py): deep-K (4096) large tiles amortize the
    in-VMEM weight unpack — binary fused GEMM runs 393 T/s (12.8x fp32,
    ~int8 MXU peak) at (512, 512, 4096). All tiles are multiples of the
    (8,128)/int8-(32,128) layout units.
    """
    tm = min(round_up(m, 128), 512)
    tn = min(round_up(n, 128), 512)
    tk = min(round_up(k, 128), 4096)
    return tm, tn, tk
