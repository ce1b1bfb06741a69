#!/usr/bin/env python
"""Width sweep for the real-data A1 (binarized-activation) anchor
(VERDICT r3 #5): full-W1A1 XNORConvNet on sklearn optdigits vs its fp32
twin, across widths. The r3 finding was Δ ≈ −29% at widths (32, 64) — the
paper's accuracy-for-speed trade at tiny width; this sweep finds the width
where binarized activations hold (or documents the paper-consistent floor).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pytorch_quantize_impls_tpu import data, models, parallel, train


def run(widths, *, quantized, steps, lr, seed=0, batch=64,
        fp32_first_last=True, binarize_inputs=True):
    model = models.XNORConvNet(
        widths=widths, quantized=quantized,
        binarize_inputs=binarize_inputs,
        fp32_first_last=fp32_first_last,
    )
    train_data, test_data = data.digits()
    x0 = jnp.asarray(train_data[0][:1])
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x0, train=True)
    tx = optax.chain(
        optax.adam(optax.cosine_decay_schedule(lr, steps)),
        train.clip_quantized_weights(),
    )
    state = train.QuantTrainState.create_for(model, variables, tx, seed=seed)
    mesh = parallel.make_mesh(None)
    state, step_fn = parallel.make_sharded_train_step(state, mesh)
    for b in data.iterate_batches(train_data, batch, seed=seed):
        if int(state.step) >= steps:
            break
        xb, yb = parallel.shard_batch(b, mesh)
        state, metrics = step_fn(state, (xb, yb))
    eval_step = train.make_eval_step()
    xt, yt = test_data
    correct = 0.0
    for i in range(0, len(xt), 256):
        xb, yb = jnp.asarray(xt[i:i+256]), jnp.asarray(yt[i:i+256])
        m = eval_step(state, (xb, yb))
        correct += float(m["accuracy"]) * len(xb)
    return correct / len(xt)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--widths", nargs="*", type=int, default=[64, 128, 256])
    p.add_argument("--steps", type=int, default=1600)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seeds", type=int, default=1)
    a = p.parse_args()
    for w in a.widths:
        for seed in range(a.seeds):
            t0 = time.time()
            accs = {}
            for q in (True, False):
                accs["quant" if q else "fp32"] = run(
                    (w, w), quantized=q, steps=a.steps, lr=a.lr, seed=seed
                )
            d = accs["quant"] - accs["fp32"]
            print(f"widths=({w},{w}) seed={seed}: quant {accs['quant']:.4f} "
                  f"fp32 {accs['fp32']:.4f} Δ {d:+.4f}  "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
