#!/usr/bin/env python
"""Calibrate the synthetic stand-in difficulty (VERDICT r3 #1).

Trains the fp32 twin of a BASELINE config at its full step budget for each
candidate difficulty setting, printing test accuracy. The goal: fp32 lands at
~80-95%, so the Δ-accuracy gate in scripts/accuracy_sweep.py can actually
detect a 1-2% quantization regression (a task both twins ace at 1.0000
proves nothing).

Example:
    python scripts/calibrate_synthetic.py --config binaryconnect_mlp \
        --noise 1.5 2.0 2.5
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from pytorch_quantize_impls_tpu import data
from pytorch_quantize_impls_tpu.utils import RunConfig, SCHEME_CONFIGS
from pytorch_quantize_impls_tpu.utils.metrics import setup_logging, log


def main() -> int:
    setup_logging()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="binaryconnect_mlp")
    p.add_argument("--noise", type=float, nargs="*", default=[2.0])
    p.add_argument("--parts", type=int, default=None)
    p.add_argument("--part-sparsity", type=int, default=None)
    p.add_argument("--max-shift", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--quant", action="store_true",
                   help="also train the quantized twin at each setting")
    a = p.parse_args()

    from scripts.accuracy_sweep import run_one

    cfg = RunConfig(**SCHEME_CONFIGS[a.config])
    if a.width is not None:
        cfg = __import__("dataclasses").replace(cfg, width=a.width)
    steps = a.steps if a.steps is not None else cfg.steps
    target = (
        data.datasets.SYNTH_MNIST_DIFFICULTY
        if a.config in ("binaryconnect_mlp", "bnn_lenet")
        else data.datasets.SYNTH_CIFAR_DIFFICULTY
    )
    # run_one builds datasets through data.mnist()/cifar10(), which read the
    # module-level difficulty dicts at construction time — so the sweep must
    # set them. Scope the mutation: snapshot + finally-restore, so nothing
    # later in this process silently inherits the last swept setting.
    orig = dict(target)
    try:
        for noise in a.noise:
            target["noise"] = noise
            if a.parts is not None:
                target["parts"] = a.parts
            if a.part_sparsity is not None:
                target["part_sparsity"] = a.part_sparsity
            if a.max_shift is not None:
                target["max_shift"] = a.max_shift
            f = run_one(cfg, fp32=True, steps=steps, lr=a.lr)
            msg = (f"{a.config} {target} -> fp32 acc {f['accuracy']:.4f} "
                   f"({f['train_s']}s)")
            if a.quant:
                q = run_one(cfg, fp32=False, steps=steps, lr=a.lr)
                msg += f"  quant acc {q['accuracy']:.4f} (Δ {q['accuracy']-f['accuracy']:+.4f})"
            log.info(msg)
            print(msg)
    finally:
        target.clear()
        target.update(orig)
    return 0


if __name__ == "__main__":
    sys.exit(main())
