"""Native host codec: ctypes bindings for ``csrc/qtpu_pack.cpp``.

The reference repo has no native components (SURVEY.md §2 header — pure
Python pip package), so nothing here is a port; this is new framework scope:
the deployment/export tooling (``scripts/export_packed.py``,
``infer.host_export``) packs multi-GB checkpoints into serving artifacts on
hosts with *no accelerator attached*, and the threaded C++ codec keeps that
host path fast (measured on this image at 8192x8192: 6.4x over the numpy
codec for the fused f32->binary pack, 1.3x for 4-bit planar — the latter is
memory-bound either way).

Layouts are bit-exact with :mod:`pytorch_quantize_impls_tpu.ops.pack`
(property-tested in ``tests/test_native.py``). Everything degrades
gracefully: if no C++ toolchain is available the numpy fallbacks are used
and ``available()`` returns False — no behavior change, only speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SRC = _CSRC / "qtpu_pack.cpp"
_BUILD = _CSRC / "build"
_SO = _BUILD / "libqtpu_pack.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

GROUP_ROWS = 32
SUPPORTED_BITS = (1, 2, 4, 8)


def _compile() -> bool:
    _BUILD.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", str(_SRC), "-o", str(_SO),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        sys.stderr.write(
            f"qtpu native build failed:\n{r.stderr.decode(errors='replace')}\n"
        )
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("QTPU_NO_NATIVE"):
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        i64, i32p, u32p, f32p, c_int = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        )
        lib.qtpu_pack_lanes.argtypes = [i32p, u32p, i64, i64, c_int]
        lib.qtpu_unpack_lanes.argtypes = [u32p, i32p, i64, i64, c_int]
        lib.qtpu_pack_planar.argtypes = [i32p, u32p, i64, i64, c_int]
        lib.qtpu_unpack_planar.argtypes = [u32p, i32p, i64, i64, c_int]
        lib.qtpu_pack_binary_planar.argtypes = [f32p, u32p, i64, i64]
        for f in (
            lib.qtpu_pack_lanes, lib.qtpu_unpack_lanes, lib.qtpu_pack_planar,
            lib.qtpu_unpack_planar, lib.qtpu_pack_binary_planar,
            lib.qtpu_version,
        ):
            f.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled codec is loadable (builds it on first call)."""
    return _load() is not None


def _check_bits(bits: int) -> int:
    if bits not in SUPPORTED_BITS:
        raise ValueError(f"bits must be one of {SUPPORTED_BITS}, got {bits}")
    return 32 // bits


def _as2d(a: np.ndarray):
    """Flatten leading dims; return (2-D view, restore-shape)."""
    lead = a.shape[:-1]
    return a.reshape(-1, a.shape[-1]), lead


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# ---- lane layout (matches ops.pack.pack / unpack) -------------------------


def pack_lanes(codes: np.ndarray, bits: int) -> np.ndarray:
    f = _check_bits(bits)
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    c2, lead = _as2d(codes)
    rows, n = c2.shape
    pn = -(-n // f)
    if lib is None:  # numpy fallback, identical layout
        pad = pn * f - n
        if pad:
            c2 = np.concatenate(
                [c2, np.zeros((rows, pad), np.int32)], axis=-1
            )
        c = c2.astype(np.uint32).reshape(rows, pn, f)
        shifts = (np.arange(f, dtype=np.uint32) * np.uint32(bits))
        return np.bitwise_or.reduce(c << shifts, axis=-1).reshape(*lead, pn)
    out = np.empty((rows, pn), np.uint32)
    lib.qtpu_pack_lanes(
        _ptr(c2, ctypes.c_int32), _ptr(out, ctypes.c_uint32), rows, n, bits
    )
    return out.reshape(*lead, pn)


def unpack_lanes(packed: np.ndarray, bits: int, size: int) -> np.ndarray:
    f = _check_bits(bits)
    lib = _load()
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    p2, lead = _as2d(packed)
    rows, pn = p2.shape
    if pn * f < size:
        raise ValueError(f"packed width {pn} too small for size {size}")
    if lib is None:
        shifts = np.arange(f, dtype=np.uint32) * np.uint32(bits)
        mask = np.uint32(2**bits - 1)
        c = (p2[..., None] >> shifts) & mask
        return c.reshape(rows, -1)[:, :size].astype(np.int32).reshape(
            *lead, size
        )
    out = np.empty((rows, size), np.int32)
    lib.qtpu_unpack_lanes(
        _ptr(p2, ctypes.c_uint32), _ptr(out, ctypes.c_int32), rows, size, bits
    )
    return out.reshape(*lead, size)


# ---- grouped-planar layout (matches ops.pack.pack_bitplanes) --------------


def planar_group_k(bits: int) -> int:
    return (32 // bits) * GROUP_ROWS


def _planar_out_rows(k: int, bits: int) -> int:
    gk = planar_group_k(bits)
    return (-(-k // gk)) * GROUP_ROWS


def pack_bitplanes(codes: np.ndarray, bits: int) -> np.ndarray:
    _check_bits(bits)
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    if codes.ndim < 2:
        raise ValueError("planar packing needs >= 2 dims")
    *lead, k, n = codes.shape
    rows = _planar_out_rows(k, bits)
    if lib is None:
        return _pack_bitplanes_np(codes, bits)
    c3 = codes.reshape(-1, k, n)
    out = np.empty((c3.shape[0], rows, n), np.uint32)
    for b in range(c3.shape[0]):
        cb = np.ascontiguousarray(c3[b])
        ob = out[b]
        lib.qtpu_pack_planar(
            _ptr(cb, ctypes.c_int32), _ptr(ob, ctypes.c_uint32), k, n, bits
        )
    return out.reshape(*lead, rows, n)


def unpack_bitplanes(packed: np.ndarray, bits: int, k: int) -> np.ndarray:
    _check_bits(bits)
    lib = _load()
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    *lead, rows, n = packed.shape
    if rows % GROUP_ROWS:
        raise ValueError(f"packed rows {rows} not a multiple of {GROUP_ROWS}")
    if _planar_out_rows(k, bits) > rows:
        raise ValueError(f"packed rows {rows} too few for k={k}")
    if lib is None:
        return _unpack_bitplanes_np(packed, bits, k)
    p3 = packed.reshape(-1, rows, n)
    out = np.empty((p3.shape[0], k, n), np.int32)
    for b in range(p3.shape[0]):
        pb = np.ascontiguousarray(p3[b])
        ob = out[b]
        lib.qtpu_unpack_planar(
            _ptr(pb, ctypes.c_uint32), _ptr(ob, ctypes.c_int32), k, n, bits
        )
    return out.reshape(*lead, k, n)


def pack_binary_planar(w: np.ndarray) -> np.ndarray:
    """f32 weights [..., k, n] -> planar 1-bit codes (w>=0 -> 1), fused."""
    lib = _load()
    w = np.ascontiguousarray(w, dtype=np.float32)
    *lead, k, n = w.shape
    if lib is None:
        return _pack_bitplanes_np((w >= 0).astype(np.int32), 1)
    rows = _planar_out_rows(k, 1)
    w3 = w.reshape(-1, k, n)
    out = np.empty((w3.shape[0], rows, n), np.uint32)
    for b in range(w3.shape[0]):
        wb = np.ascontiguousarray(w3[b])
        ob = out[b]
        lib.qtpu_pack_binary_planar(
            _ptr(wb, ctypes.c_float), _ptr(ob, ctypes.c_uint32), k, n
        )
    return out.reshape(*lead, rows, n)


# ---- numpy fallbacks for the planar layout --------------------------------


def _pack_bitplanes_np(codes: np.ndarray, bits: int) -> np.ndarray:
    f = 32 // bits
    gk = planar_group_k(bits)
    *lead, k, n = codes.shape
    kp = -(-k // gk) * gk
    if kp != k:
        pad = [(0, 0)] * (codes.ndim - 2) + [(0, kp - k), (0, 0)]
        codes = np.pad(codes, pad)
    c = codes.astype(np.uint32)
    rows = []
    for g in range(kp // gk):
        word = np.zeros((*lead, GROUP_ROWS, n), np.uint32)
        base = g * gk
        for i in range(f):
            word |= (
                c[..., base + i * GROUP_ROWS : base + (i + 1) * GROUP_ROWS, :]
                << np.uint32(bits * i)
            )
        rows.append(word)
    return np.concatenate(rows, axis=-2)


def _unpack_bitplanes_np(word: np.ndarray, bits: int, k: int) -> np.ndarray:
    f = 32 // bits
    mask = np.uint32(2**bits - 1)
    r = word.shape[-2]
    parts = []
    for g in range(r // GROUP_ROWS):
        grp = word[..., g * GROUP_ROWS : (g + 1) * GROUP_ROWS, :]
        for i in range(f):
            parts.append(((grp >> np.uint32(bits * i)) & mask).astype(np.int32))
    return np.concatenate(parts, axis=-2)[..., :k, :]
