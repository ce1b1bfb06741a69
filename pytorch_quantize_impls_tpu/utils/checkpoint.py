"""Checkpoint / resume via orbax (SURVEY.md §5 checkpoint row).

Policy: checkpoint the fp32 master params + optimizer state + batch stats +
step — quantized/packed tensors are DERIVED and recomputable, so they are
never checkpointed (the packed inference artifact has its own format in
``infer.save_packed``). Async-capable; multi-host safe (orbax coordinates
across processes).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from pytorch_quantize_impls_tpu.train.state import QuantTrainState


class CheckpointManager:
    """Thin orbax wrapper bound to a train state's structure."""

    def __init__(
        self,
        directory: str,
        *,
        max_to_keep: int = 3,
        save_interval_steps: int = 1,
        async_save: bool = True,
    ):
        self._dir = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, state: QuantTrainState, *, force: bool = False) -> bool:
        """Save at ``state.step`` (async unless configured otherwise).

        A step that is already on disk is a no-op, not an error — happens
        when a resumed run restarts exactly at a saved step (e.g. resuming
        a job that was killed after its final save).
        """
        step = int(state.step)
        if step in self._mgr.all_steps():
            return False
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(
        self, abstract_state: QuantTrainState, step: Optional[int] = None
    ) -> Optional[QuantTrainState]:
        """Restore the latest (or given) step into ``abstract_state``'s
        structure; returns None if no checkpoint exists.

        When no explicit step is given, falls back through older steps if
        the newest one is torn (e.g. the writer was killed mid-finalize or
        another process garbage-collected it between listing and read).
        """
        if step is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state)
            )
        for s in sorted(self._mgr.all_steps(), reverse=True):
            try:
                return self._mgr.restore(
                    s, args=ocp.args.StandardRestore(abstract_state)
                )
            except (FileNotFoundError, ValueError):
                continue
        return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        """Block until any in-flight async save completes."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
