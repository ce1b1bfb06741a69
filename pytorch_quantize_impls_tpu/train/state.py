"""Train state: params + opt state + batch stats + per-step PRNG.

Functional replacement for the reference's (model, optimizer) pair
(SURVEY.md §3.3). The quant RNG key is folded with the step counter so
stochastic quantizers are deterministic given (seed, step) — and identical on
every host of a multi-host job (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct
from flax.training import train_state


class QuantTrainState(train_state.TrainState):
    batch_stats: Any = None
    quant_key: jax.Array = struct.field(default=None)

    def step_quant_key(self) -> jax.Array:
        """Per-step quant RNG: fold the (host-invariant) step into the seed."""
        return jax.random.fold_in(self.quant_key, self.step)

    @classmethod
    def create_for(cls, model, variables, tx, seed: int = 0):
        return cls.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats"),
            quant_key=jax.random.PRNGKey(seed),
        )
