"""Device mesh construction (data x model axes).

One mesh serves every scale: a single chip (1x1), one host (e.g. 4x2), or a
multi-host pod slice — `jax.make_mesh` lays devices out so the "model" axis
rides ICI within a host and "data" spans hosts/DCN, which is the layout the
collectives want (TP all-gathers are latency-bound, DP psums are
bandwidth-bound and overlap with backward).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh.

    ``shape=None`` auto-selects: all devices on the data axis (pure DP) —
    the right default for the CNN/MLP workloads of BASELINE configs 1-5,
    where weights fit on-chip and batch scaling is what matters. Pass an
    explicit shape (e.g. ``(n // 2, 2)``) for TP.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    # Auto axis types = GSPMD: we annotate inputs, XLA propagates shardings
    # and inserts collectives. (jax 0.9 defaults to Explicit, which demands
    # out_sharding annotations on ambiguous ops like the CE-loss gather.)
    auto = (jax.sharding.AxisType.Auto,) * len(axis_names)
    return jax.make_mesh(shape, axis_names, axis_types=auto, devices=devs)


def multihost_initialize(**kwargs) -> None:
    """Initialize JAX distributed runtime (one process per host).

    Thin wrapper over ``jax.distributed.initialize`` so scripts have a single
    entry point; no-op if already initialized or single-process.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized
