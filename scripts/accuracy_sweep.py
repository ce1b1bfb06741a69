#!/usr/bin/env python
"""Δ-accuracy harness: train every BASELINE config quantized AND as its fp32
twin, report the accuracy gap (BASELINE.json:5 target: Δacc ≤ 0.5%).

Runs in-process (one backend init), sequentially over configs. Uses real
MNIST/CIFAR-10 when ``$QTPU_DATA_DIR`` has them, else the deterministic
synthetic stand-ins (SURVEY.md §6 provenance caveat — no data on this image).

Example:
    python scripts/accuracy_sweep.py --steps 800 --out ACCURACY.md
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pytorch_quantize_impls_tpu import data, models, parallel, train
from pytorch_quantize_impls_tpu.utils import RunConfig, SCHEME_CONFIGS
from pytorch_quantize_impls_tpu.utils.config import build_model
from pytorch_quantize_impls_tpu.utils.metrics import setup_logging, log


def run_one(cfg: RunConfig, *, fp32: bool, steps: int, lr: float) -> dict:
    """Train one config (quantized or fp32 twin) and return eval accuracy.

    Cosine-decayed Adam: BinaryConnect-style training needs LR decay to
    anneal the STE noise floor (measured on real digits: Δacc -1.6% with
    constant LR, 0.0% with cosine — the fp32 twin gets the same schedule,
    so the comparison stays fair)."""
    model, input_shape, dataset = build_model(cfg, fp32=fp32)
    if dataset == "mnist":
        train_data, test_data = data.mnist(flatten=(len(input_shape) == 1))
    elif dataset == "digits":
        train_data, test_data = data.digits(flatten=(len(input_shape) == 1))
    else:
        train_data, test_data = data.cifar10()

    x0 = jnp.asarray(train_data[0][:1])
    rngs = {"params": jax.random.PRNGKey(cfg.seed)}
    if not cfg.deterministic:
        rngs["quant"] = jax.random.PRNGKey(cfg.seed + 1)
    variables = model.init(rngs, x0, train=True)
    tx = optax.chain(
        optax.adam(optax.cosine_decay_schedule(lr, steps)),
        train.clip_quantized_weights(),
    )
    state = train.QuantTrainState.create_for(model, variables, tx, seed=cfg.seed)

    mesh = parallel.make_mesh(None)
    state, step_fn = parallel.make_sharded_train_step(
        state, mesh, has_quant_rng=not cfg.deterministic
    )

    t0 = time.time()
    for batch in data.iterate_batches(train_data, cfg.batch_size, seed=cfg.seed):
        if int(state.step) >= steps:
            break
        xb, yb = parallel.shard_batch(batch, mesh)
        state, metrics = step_fn(state, (xb, yb))
    train_s = time.time() - t0

    eval_step = train.make_eval_step()
    xt, yt = test_data
    # Full test set — tail batch included (dropping it costs up to 0.4%
    # resolution on small sets like digits' 359 samples).
    correct = 0.0
    for i in range(0, len(xt), 256):
        xb, yb = jnp.asarray(xt[i : i + 256]), jnp.asarray(yt[i : i + 256])
        m = eval_step(state, (xb, yb))
        correct += float(m["accuracy"]) * len(xb)
    acc = correct / len(xt)
    return {"accuracy": acc, "train_s": round(train_s, 1), "loss": float(metrics["loss"])}


def main() -> int:
    setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=None,
                   help="override per-config step budget (default: cfg.steps)")
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--configs", nargs="*", default=sorted(SCHEME_CONFIGS))
    p.add_argument("--out", default=None, help="write a markdown report here")
    p.add_argument("--json-out", default=None)
    p.add_argument("--gate", type=float, default=None,
                   help="exit 1 if any |Δacc| exceeds this (e.g. 0.005)")
    a = p.parse_args()

    rows = []
    for name in a.configs:
        cfg = RunConfig(**SCHEME_CONFIGS[name])
        steps = a.steps if a.steps is not None else cfg.steps
        log.info("=== %s quantized (%d steps) ===", name, steps)
        q = run_one(cfg, fp32=False, steps=steps, lr=a.lr)
        log.info("=== %s fp32 twin ===", name)
        f = run_one(cfg, fp32=True, steps=steps, lr=a.lr)
        row = {
            "config": name,
            "quant_acc": round(q["accuracy"], 4),
            "fp32_acc": round(f["accuracy"], 4),
            "delta_acc": round(q["accuracy"] - f["accuracy"], 4),
            "quant_train_s": q["train_s"],
            "fp32_train_s": f["train_s"],
        }
        rows.append(row)
        log.info("%s: quant %.4f fp32 %.4f Δ %.4f", name,
                 row["quant_acc"], row["fp32_acc"], row["delta_acc"])

    real_data = data.datasets._data_dir() is not None
    header = (
        f"# Δ-accuracy report — per-config step budgets (cosine-decay Adam), "
        f"{'real' if real_data else 'synthetic'} MNIST/CIFAR "
        f"(digits config is always real), {jax.devices()[0].platform}\n\n"
        "| config | quant acc | fp32 acc | Δacc | target |\n"
        "|---|---|---|---|---|\n"
    )
    lines = [
        f"| {r['config']} | {r['quant_acc']:.4f} | {r['fp32_acc']:.4f} "
        f"| {r['delta_acc']:+.4f} | {'PASS' if r['delta_acc'] >= -0.005 else 'FAIL'} |"
        for r in rows
    ]
    report = header + "\n".join(lines) + "\n"
    print(report)
    if a.out:
        Path(a.out).write_text(report)
    if a.json_out:
        Path(a.json_out).write_text(json.dumps(rows, indent=1))
    if a.gate is not None and any(r["delta_acc"] < -a.gate for r in rows):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
