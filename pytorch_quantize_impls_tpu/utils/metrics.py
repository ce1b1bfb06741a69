"""Metrics/logging (SURVEY.md §5): JSONL metrics stream + stdlib logging.

Writes one JSON object per step — trivially greppable, loads into pandas,
and host-0-only under multi-host (other hosts no-op).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax

log = logging.getLogger("qtpu")


def setup_logging(level: int = logging.INFO) -> None:
    # force=True: jax/absl already hang a handler on the root logger at
    # import time, which would make a plain basicConfig a silent no-op
    # (and swallow every INFO line).
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        force=True,
    )


class MetricsWriter:
    def __init__(self, path: Optional[str], *, host0_only: bool = True):
        self._f = None
        if path and (not host0_only or jax.process_index() == 0):
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self._t0 = time.time()

    def write(self, step: int, metrics: Dict[str, Any]) -> None:
        if self._f is None:
            return
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
