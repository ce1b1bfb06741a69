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
import dataclasses
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


def _warm_start(q_vars, fp_vars):
    """Initialize quantized variables from the trained fp32 twin (standard
    QAT fine-tuning, VERDICT r4 #1). The twins share module names except the
    quantized wrappers nest their parameters one level deeper
    (``DorefaConv -> 'conv' -> kernel``); strip those segments to match.
    Leaves with no shape-matching twin (e.g. PACT alpha) keep their fresh
    init. batch_stats transfer too (same BN scopes in both twins)."""
    flat_fp = {
        jax.tree_util.keystr(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(fp_vars)[0]
    }

    def pick(path, leaf):
        key = jax.tree_util.keystr(path)
        for k in (key, key.replace("['conv']", "").replace("['dense']", "")):
            v = flat_fp.get(k)
            if v is not None and jnp.shape(v) == jnp.shape(leaf):
                return jnp.asarray(v, jnp.asarray(leaf).dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(pick, q_vars)


def _project_elastic(params):
    """Hard-project elastic-trained kernels to the binary grid (the
    end-to-end contract of penalty-based quantization: train fp with the
    W-shaped penalty, deploy the projected weights).

    Projection is BWN-style ``alpha_c * sign(w)`` with a per-out-channel
    ``alpha = mean|w|`` — the standard binary deployment form the packed
    xnor kernels execute natively (sign codes in the GEMM, alpha in the
    epilogue). At full penalty convergence ``w -> ±1`` so ``alpha -> 1``
    and this coincides with the pure ±1 grid; before full convergence it
    measures the deployable accuracy without penalizing overall magnitude
    the following BatchNorm absorbs anyway."""

    def proj(path, leaf):
        if jax.tree_util.keystr(path).endswith("['kernel']"):
            alpha = jnp.mean(jnp.abs(leaf), axis=0, keepdims=True)
            return (alpha * jnp.where(leaf >= 0, 1.0, -1.0)).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(proj, params)


def run_one(
    cfg: RunConfig,
    *,
    fp32: bool,
    steps: int,
    lr: float,
    init_variables=None,
    return_variables: bool = False,
) -> dict:
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
    if init_variables is not None:
        variables = _warm_start(variables, init_variables)
    tx = optax.chain(
        optax.adam(optax.cosine_decay_schedule(lr, steps)),
        train.clip_quantized_weights(),
    )
    state = train.QuantTrainState.create_for(model, variables, tx, seed=cfg.seed)

    mesh = parallel.make_mesh(None)
    if cfg.elastic_ramp and cfg.elastic_weight:
        # reach lambda_max at 60% of budget, HOLD for the rest: the pull-to-
        # grid phase needs time at full strength (ramping to max only at the
        # final step measured 0.9805 vs 0.9833 with the hold — r5)
        lam_max, total = float(cfg.elastic_weight), 0.6 * float(steps)
        ew = lambda step: lam_max * jnp.minimum(step / total, 1.0)  # noqa: E731
    else:
        ew = cfg.elastic_weight
    state, step_fn = parallel.make_sharded_train_step(
        state, mesh, has_quant_rng=not cfg.deterministic,
        elastic_weight=ew,
    )

    t0 = time.time()
    for batch in data.iterate_batches(train_data, cfg.batch_size, seed=cfg.seed):
        if int(state.step) >= steps:
            break
        xb, yb = parallel.shard_batch(batch, mesh)
        state, metrics = step_fn(state, (xb, yb))
    train_s = time.time() - t0

    if not fp32 and cfg.config.startswith("elastic"):
        state = state.replace(params=_project_elastic(state.params))

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
    out = {"accuracy": acc, "train_s": round(train_s, 1), "loss": float(metrics["loss"])}
    if return_variables:
        out["variables"] = {"params": jax.device_get(state.params)}
        if state.batch_stats is not None:
            out["variables"]["batch_stats"] = jax.device_get(state.batch_stats)
    return out


def main() -> int:
    setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=None,
                   help="override per-config step budget (default: cfg.steps)")
    p.add_argument("--lr", type=float, default=None,
               help="override every config's lr (default: cfg.lr)")
    p.add_argument("--configs", nargs="*", default=sorted(SCHEME_CONFIGS))
    p.add_argument("--seeds", type=int, default=1,
                   help="run each config at this many seeds (base..base+N-1) "
                        "and gate the SEED-MEAN Δacc (VERDICT r4 #2: a gate "
                        "a seed re-roll can flip is not evidence)")
    p.add_argument("--warm-start", action="store_true",
                   help="force QAT warm start from the fp32 twin for every "
                        "config (configs can also opt in via cfg.warm_start)")
    p.add_argument("--set", nargs="*", default=[], metavar="K=V",
                   help="override RunConfig fields for every config, e.g. "
                        "--set elastic_weight=0.02 warm_start=1")
    p.add_argument("--out", default=None, help="write a markdown report here")
    p.add_argument("--json-out", default=None)
    p.add_argument("--gate", type=float, default=None,
                   help="exit 1 if any seed-mean Δacc exceeds this (e.g. 0.005)")
    a = p.parse_args()

    overrides = {}
    ftypes = {f.name: f.type for f in dataclasses.fields(RunConfig)}
    for kv in a.set:
        k, v = kv.split("=", 1)
        t = ftypes.get(k)
        if t is None:
            raise SystemExit(f"--set: unknown RunConfig field {k!r}")
        overrides[k] = (
            v if "str" in str(t) else
            (bool(int(v)) if "bool" in str(t) else
             (int(v) if "int" in str(t) else float(v)))
        )

    rows = []
    for name in a.configs:
        base = RunConfig(**{**SCHEME_CONFIGS[name], **overrides})
        steps = a.steps if a.steps is not None else base.steps
        lr = a.lr if a.lr is not None else base.lr
        warm = a.warm_start or base.warm_start
        deltas, q_accs, f_accs = [], [], []
        q_s = f_s = 0.0
        for s in range(a.seeds):
            cfg = dataclasses.replace(base, seed=base.seed + s)
            log.info("=== %s fp32 twin (seed %d, %d steps) ===",
                     name, cfg.seed, steps)
            f = run_one(cfg, fp32=True, steps=steps, lr=lr,
                        return_variables=warm)
            log.info("=== %s quantized (seed %d%s) ===", name, cfg.seed,
                     ", warm-started" if warm else "")
            q = run_one(cfg, fp32=False, steps=steps, lr=lr,
                        init_variables=f.get("variables") if warm else None)
            deltas.append(q["accuracy"] - f["accuracy"])
            q_accs.append(q["accuracy"])
            f_accs.append(f["accuracy"])
            q_s += q["train_s"]
            f_s += f["train_s"]
            log.info("%s seed %d: quant %.4f fp32 %.4f Δ %.4f", name, cfg.seed,
                     q["accuracy"], f["accuracy"], deltas[-1])
        row = {
            "config": name,
            "quant_acc": round(float(np.mean(q_accs)), 4),
            "fp32_acc": round(float(np.mean(f_accs)), 4),
            "delta_acc": round(float(np.mean(deltas)), 4),
            "delta_spread": round(
                float(np.max(deltas) - np.min(deltas)) / 2, 4
            ),
            "seeds": a.seeds,
            "warm_start": bool(warm),
            "deltas": [round(float(d), 4) for d in deltas],
            "quant_train_s": round(q_s, 1),
            "fp32_train_s": round(f_s, 1),
        }
        rows.append(row)
        log.info("%s: mean Δ %.4f ±%.4f over %d seed(s)", name,
                 row["delta_acc"], row["delta_spread"], a.seeds)

    real_data = data.datasets._data_dir() is not None
    header = (
        f"# Δ-accuracy report — per-config step budgets (cosine-decay Adam), "
        f"{'real' if real_data else 'synthetic'} MNIST/CIFAR "
        f"(digits config is always real), {jax.devices()[0].platform}\n\n"
        "| config | quant acc | fp32 acc | Δacc (seed mean) | ±spread | seeds | target |\n"
        "|---|---|---|---|---|---|---|\n"
    )
    lines = [
        f"| {r['config']} | {r['quant_acc']:.4f} | {r['fp32_acc']:.4f} "
        f"| {r['delta_acc']:+.4f} | ±{r['delta_spread']:.4f} | {r['seeds']} "
        f"| {'PASS' if r['delta_acc'] >= -0.005 else 'FAIL'} |"
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
