#!/usr/bin/env python
"""Example 5 — the full production-training stack in one script.

Everything-quantized training, composed: a quantized model (fake-quant STE
forward), 8-bit Adam (int8/uint8 log-coded moments, ~4x optimizer-state
HBM), clamp-after-step, int8-compressed gradient all-reduce on the data
axis (EQuARX-style), and async orbax checkpointing with kill-safe resume.
Runs on 8 virtual CPU devices here; the identical code scales to a pod
slice after ``parallel.multihost_initialize()``.

    python examples/production_training.py
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("QTPU_EXAMPLE_REAL_DEVICES"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from pytorch_quantize_impls_tpu import data, models, parallel, train
from pytorch_quantize_impls_tpu.utils.checkpoint import CheckpointManager


def main() -> int:
    n = len(jax.devices())
    steps = 400

    (xtr, ytr), (xte, yte) = data.digits(flatten=True)  # real data
    model = models.BinaryConnectMLP(hidden=128)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(xtr[:1]), train=True
    )

    # 8-bit Adam + clamp-after-step, one optax chain, one jitted step.
    tx = optax.chain(
        train.quantized_adam(optax.cosine_decay_schedule(3e-3, steps)),
        train.clip_quantized_weights(),
    )
    state = train.QuantTrainState.create_for(model, variables, tx)

    opt_bytes = train.optimizer_state_bytes(state.opt_state)
    fp32_bytes = train.optimizer_state_bytes(
        optax.adam(1e-3).init(state.params)
    )
    print(f"optimizer state: {opt_bytes/1e3:.0f} kB (8-bit) vs "
          f"{fp32_bytes/1e3:.0f} kB (fp32 Adam) = {fp32_bytes/opt_bytes:.1f}x")

    # DP mesh with int8-quantized gradient all-reduce (cuts the DP
    # gradient exchange bytes 4x; EQuARX-style stochastic-rounded ring).
    mesh = parallel.make_mesh((n, 1))
    state, step = parallel.make_quantized_dp_train_step(state, mesh, bits=8)

    ckpt_dir = tempfile.mkdtemp(prefix="qtpu_ckpt_")
    mgr = CheckpointManager(ckpt_dir, async_save=False)

    with mesh:
        for i, batch in enumerate(
            data.iterate_batches((xtr, ytr), 128, seed=0)
        ):
            if int(state.step) >= steps:
                break
            xb, yb = parallel.shard_batch(batch, mesh)
            state, metrics = step(state, (xb, yb))
            if int(state.step) % 20 == 0:
                mgr.save(state, force=True)
                print(f"step {int(state.step):3d} loss {float(metrics['loss']):.4f} "
                      f"(checkpointed)")
    mgr.wait()

    # kill-safe resume: rebuild from the artifact and keep training.
    fresh = train.QuantTrainState.create_for(
        model, model.init({"params": jax.random.PRNGKey(0)},
                          jnp.asarray(xtr[:1]), train=True), tx
    )
    restored = mgr.restore(fresh)
    print(f"restored at step {int(restored.step)} from {ckpt_dir}")
    mgr.close()

    ev = train.make_eval_step()(
        state, (jnp.asarray(xte), jnp.asarray(yte))
    )
    acc = float(ev["accuracy"])
    print(f"eval accuracy (real digits test split): {acc:.4f}")
    assert acc > 0.93, acc
    return 0


if __name__ == "__main__":
    sys.exit(main())
