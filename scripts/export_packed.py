#!/usr/bin/env python
"""Export a training checkpoint to the packed serving artifact, on host.

Deployment tooling (new scope — the reference has no deployment story,
SURVEY.md §5): runs on a CPU box with no accelerator, reads the orbax
checkpoint (fp32 master weights), packs every quantized layer with the
native C++ codec (utils/native.py; numpy fallback), and writes the
``infer.save_packed`` npz artifact that serving hosts load.

Example:
    python scripts/export_packed.py --config binaryconnect_mlp \
        --checkpoint-dir /ckpts/run1 --out model.packed.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--cpu", action="store_true", default=True,
                   help="force the CPU backend (default: on)")
    a = p.parse_args()

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_quantize_impls_tpu import train
    from pytorch_quantize_impls_tpu.infer import host_export
    from pytorch_quantize_impls_tpu.utils import RunConfig, SCHEME_CONFIGS, native
    from pytorch_quantize_impls_tpu.utils.checkpoint import CheckpointManager
    from pytorch_quantize_impls_tpu.utils.config import build_model

    cfg = RunConfig(**SCHEME_CONFIGS[a.config])
    model, input_shape, _ = build_model(cfg)
    sample = jnp.zeros((1, *input_shape), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0)}
    if not cfg.deterministic:
        rngs["quant"] = jax.random.PRNGKey(1)
    variables = model.init(rngs, sample, train=False)
    tx = optax.chain(optax.adam(cfg.lr), train.clip_quantized_weights())
    abstract = train.QuantTrainState.create_for(model, variables, tx)

    mgr = CheckpointManager(a.checkpoint_dir, async_save=False)
    state = mgr.restore(abstract, step=a.step)
    mgr.close()
    if state is None:
        print(f"no checkpoint found in {a.checkpoint_dir}", file=sys.stderr)
        return 1

    restored = {"params": state.params}
    if state.batch_stats is not None:
        restored["batch_stats"] = state.batch_stats
    n = host_export.export_packed(a.out, model, restored, sample)
    codec = "native C++" if native.available() else "numpy fallback"
    print(f"wrote {n} packed layers (step {int(state.step)}, {codec}) -> {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
