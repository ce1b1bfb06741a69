"""Run configs (SURVEY.md §5 config row): dataclasses, idiomatic-light.

Preserves the reference's semantic knobs exactly — {det|stoch}, k_w/k_a/k_g
bits, fsr, with_sign, lin_back — plus run-level knobs (model, data, mesh).
The five named configs mirror BASELINE.json:6-12.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class RunConfig:
    # model / scheme
    config: str = "binaryconnect_mlp"  # one of SCHEME_CONFIGS
    deterministic: bool = True  # det vs stoch quantization
    w_bits: int = 1
    a_bits: int = 0
    g_bits: int = 0  # DoReFa gradient quantization (0 = off)
    # Activation-quantizer flavor for DoReFa configs: "fixed" clip[0,1] or
    # "pact" learnable per-layer clip (arXiv:1805.06085).
    a_quant: str = "fixed"
    # QAT warm start: initialize the quantized run from the trained fp32
    # twin's weights (standard quantized fine-tuning; the twin is trained
    # anyway for the Δacc comparison, so this costs nothing extra).
    warm_start: bool = False
    fsr: float = 1.0
    # model capacity (None = model default). Binary W1A1 nets need width to
    # compensate 1-bit capacity (BNN paper uses 2-8x wider nets than fp32
    # baselines); the hardened synthetic gate made this measurable.
    width: Optional[int] = None
    # training
    batch_size: int = 128
    steps: int = 2000
    lr: float = 3e-3
    elastic_weight: float = 0.0
    # Linear-ramp the elastic penalty 0 -> elastic_weight over the run
    # (loss-aware recipe: learn freely early, pull to the grid late).
    elastic_ramp: bool = False
    seed: int = 0
    # distribution
    mesh_shape: Optional[Tuple[int, int]] = None  # None -> all-data auto
    # io
    checkpoint_dir: Optional[str] = None
    metrics_path: Optional[str] = None
    profile_dir: Optional[str] = None
    data_dir: Optional[str] = None  # overrides $QTPU_DATA_DIR


def _mk(config, **kw):
    base = dict(config=config)
    base.update(kw)
    return base


# BASELINE.json:6-12 evaluation configs
SCHEME_CONFIGS = {
    # steps=6000: on the hardened (discriminative) synthetic task the binary
    # MLP needs the longer cosine anneal to close the STE gap — measured
    # (calibrate_synthetic, r4): 2000 steps Δ −2.4%, 6000 steps Δ −0.47%.
    # r5: + QAT warm start from the fp32 twin (trained anyway for the Δacc
    # comparison). The cold-start row sat AT the gate boundary with ±0.5%
    # seed spread (r4 disclosure: −0.47/−1.37/−0.62% on seeds 0/1/2); the
    # warm-started 3-seed mean is +0.59% ±0.64 — robustly inside the gate.
    "binaryconnect_mlp": _mk(
        "binaryconnect_mlp", w_bits=1, steps=6000, warm_start=True
    ),
    # W1A1 configs: budgets/widths set where the binarized-activation
    # training floor stabilizes on the discriminative synthetic gate (the
    # steps/width scaling tables live in ACCURACY.md; binary nets converge
    # ~3x slower than their fp32 twins — DESIGN.md §3c).
    # steps=12000 (r5): the 8000-step r4 gate point was un-converged
    # (-4.9% @8k vs -3.4% @12k). QAT warm start measured EXACTLY no effect
    # here (-0.0344 warm and cold) — sign(w) + binarized activations reset
    # the training dynamics, so initialization does not transfer; budget
    # and width are the only levers (see ACCURACY.md scaling table).
    "bnn_lenet": _mk("bnn_lenet", w_bits=1, a_bits=1, width=128, steps=12000),
    # bnn_lenet + the VERDICT r4 #3 lever: learnable per-input-channel scale
    # on every binarized activation (nn/binary.py::_input_binarizer —
    # magnitude restoration; the pre-sign threshold half of the lever is
    # already parameterized by the preceding BatchNorm's bias). MEASURED
    # (r5, seed 0, gated budget): Δ −4.06% vs −3.44% plain — the lever
    # does NOT help this model; kept as the ablation config (ACCURACY.md
    # bnn_lenet note).
    "bnn_lenet_as": _mk(
        "bnn_lenet_as", w_bits=1, a_bits=1, width=128, steps=12000
    ),
    # warm_start (r5): QAT warm start from the fp32 twin takes this row
    # from -3.2% (cold, r4) to -0.08% — unlike plain-BNN bnn_lenet (where
    # warm start measured zero effect), the XNOR α/K scaling preserves the
    # warm-started weight magnitudes, so the initialization transfers.
    "xnor_cifar": _mk(
        "xnor_cifar", w_bits=1, a_bits=1, steps=12000, warm_start=True
    ),
    # W4A4 with conv-input act quant (see models/resnet.py r4 note) and the
    # r5 standard recipe (VERDICT r4 #1): PACT learnable per-layer clip on
    # the activation path (the fixed clip[0,1] left a -10.5% gap the
    # literature says W4A4 does not have), QAT warm start from the trained
    # fp32 twin, and the long cosine anneal. elastic_weight carries the
    # PACT alpha L2 (paper §4; no elastic layers in this model, so the
    # sown-losses sum is exactly the alpha penalty).
    "dorefa_resnet20": _mk(
        "dorefa_resnet20", w_bits=4, a_bits=4, a_quant="pact",
        warm_start=True, elastic_weight=2e-4, steps=6000,
    ),
    # Weights-only W4 variant: isolates the weight-quantization path, which
    # gates cleanly (the r4 ablation measured W4A32 within +-0.5% of fp32 at
    # every budget) — the implementation-correctness anchor for DoReFa,
    # separating "the math is right" from the activation-clip training
    # trade the W4A4 row documents.
    "dorefa_resnet20_w4": _mk("dorefa_resnet20_w4", w_bits=4, a_bits=0),
    "logquant_vgg": _mk("logquant_vgg", w_bits=4, fsr=1.0),
    # REAL-data anchor (sklearn bundled digits; see data.digits docstring).
    # hidden=512 + cosine decay + 1600 steps measured Δacc = 0.0 vs fp32;
    # narrower/shorter runs lose 1-3% (binary nets need width).
    "binaryconnect_digits": _mk(
        "binaryconnect_digits", w_bits=1, batch_size=64, steps=1600
    ),
    # REAL-data CONV anchor: Binary-Weight-Network mode XNOR conv (alpha-
    # scaled binary weights, real activations — XNOR paper §3.1, the
    # near-lossless mode) on the same 8x8 digits: covers the conv/alpha
    # training path with real data, not just the MLP. (Full-XNOR with
    # binarized activations measures Δacc ≈ -29% at this tiny scale —
    # the paper's accuracy-for-speed trade, not an implementation bug —
    # so the gated anchor uses BWN; see ACCURACY.md.)
    "xnor_digits": _mk(
        "xnor_digits", w_bits=1, a_bits=0, batch_size=64, steps=1600
    ),
    # REAL-data A1 anchor (VERDICT r3 #5): full-XNOR mode — binarized
    # ACTIVATIONS and weights (W1A1) — on the same real digits. The r3
    # informational row measured Δ ≈ -29% at widths (32, 64); the width
    # sweep (scripts/a1_width_sweep.py) shows that is the capacity floor
    # the BNN/XNOR papers predict, not an implementation defect: at
    # (64, 64) Δ = +0.0056 and at (128, 128) Δ = 0.0000. Gated at (128,
    # 128) where binarized activations hold.
    "xnor_digits_a1": _mk(
        "xnor_digits_a1", w_bits=1, a_bits=1, batch_size=64, steps=1600
    ),
    # --- r5 scheme-zoo completion (VERDICT r4 #6/#7): one trained REAL-data
    # row per remaining scheme family, all CPU-cheap on sklearn digits. ---
    # Stochastic BinaryConnect (arXiv:1511.00363 §2.3): fresh Bernoulli
    # weight draws per step via the 'quant' rng; eval uses the clipped
    # master (the expectation network, paper §2.4). Recipe (measured r5):
    # the sampling noise needs a ~7x HIGHER LR than the deterministic row
    # to polarize the masters — lr sweep at 4800 steps: 3e-4 -> 0.10,
    # 1e-3 -> 0.36, 3e-3 -> 0.78, 1e-2 -> 0.95, 2e-2 -> 0.9916 = fp32 twin
    # exactly. Spread init measured no gain; LR is the lever.
    "binaryconnect_digits_stoch": _mk(
        "binaryconnect_digits_stoch", w_bits=1, deterministic=False,
        batch_size=64, steps=4800, lr=2e-2,
    ),
    # TernaryConnect deterministic ({-1,0,+1} with the 0.5 thresholds).
    # Masters use the paper's uniform(-1,1) domain init (ternary_spread_init
    # — fan-in-scaled init lands every weight in the |w|<0.5 dead zone and
    # the net quantizes to all-zero); 3200 steps reaches the plateau.
    "ternary_digits": _mk(
        "ternary_digits", w_bits=2, batch_size=64, steps=3200
    ),
    # TernaryConnect stochastic (the paper's headline variant, §2.2):
    # two-sided Bernoulli draws per step; eval uses the clipped master
    # (E[T(w)] = clip(w)). Unlike stochastic BC this needs NO lr boost —
    # the zero level keeps sampling noise proportional to |w|.
    "ternary_digits_stoch": _mk(
        "ternary_digits_stoch", w_bits=2, deterministic=False,
        batch_size=64, steps=3200,
    ),
    # Elastic binary penalty (loss-aware): fp32 weights trained with the
    # W-shaped nearest-grid penalty, HARD-projected (BWN-style alpha*sign)
    # at eval — the end-to-end contract of penalty-based quantization.
    # Recipe (measured r5): the penalty is mean-normalized, so lambda must
    # rival the CE gradient (5e-3 left weights at dist-to-grid 0.93 and
    # -16% projected; lambda=100 with a LINEAR RAMP — learn freely early,
    # pull to the grid late — reaches the method's plateau. Constant-30
    # costs 0.3% more than the ramp; warm-start and post-projection BN
    # recalibration measured no further gain.)
    "elastic_digits": _mk(
        "elastic_digits", w_bits=1, elastic_weight=100.0, elastic_ramp=True,
        batch_size=64, steps=3200,
    ),
    # DoReFa W1A2G6 (the paper's headline AlexNet config, arXiv:1606.06160
    # table 2) on the digits MLP: end-to-end evidence for the g_bits
    # gradient-quantization path (VERDICT r4 #6). deterministic=False routes
    # the 'quant' rng the stochastic gradient rounding needs.
    "dorefa_digits_g6": _mk(
        "dorefa_digits_g6", w_bits=1, a_bits=2, g_bits=6,
        deterministic=False, batch_size=64, steps=1600,
    ),
}


def build_model(cfg: RunConfig, *, fp32: bool = False):
    """Config name -> (model, input_shape, dataset_name).

    ``fp32=True`` builds the full-precision twin for Δ-accuracy runs.
    """
    from pytorch_quantize_impls_tpu import models

    q = not fp32
    if cfg.config == "binaryconnect_mlp":
        return (
            models.BinaryConnectMLP(
                deterministic=cfg.deterministic, quantized=q
            ),
            (28 * 28,),
            "mnist",
        )
    if cfg.config == "binaryconnect_digits":
        return (
            models.BinaryConnectMLP(
                hidden=512, deterministic=cfg.deterministic, quantized=q
            ),
            (8 * 8,),
            "digits",
        )
    if cfg.config == "binaryconnect_digits_stoch":
        return (
            models.BinaryConnectMLP(
                hidden=512, deterministic=False, quantized=q
            ),
            (8 * 8,),
            "digits",
        )
    if cfg.config in ("ternary_digits", "ternary_digits_stoch"):
        kind = "fp32" if fp32 else (
            "ternary" if cfg.deterministic else "ternary_stoch"
        )
        return models.MLP(features=(512, 512, 10), layer=kind), (8 * 8,), "digits"
    if cfg.config == "elastic_digits":
        kind = "fp32" if fp32 else "elastic"
        return (
            models.MLP(features=(512, 512, 10), layer=kind, elastic_grid="binary"),
            (8 * 8,),
            "digits",
        )
    if cfg.config == "dorefa_digits_g6":
        kind = "fp32" if fp32 else "dorefa"
        return (
            models.MLP(
                features=(512, 512, 10), layer=kind, bits=cfg.w_bits,
                a_bits=cfg.a_bits, g_bits=cfg.g_bits, a_quant=cfg.a_quant,
            ),
            (8 * 8,),
            "digits",
        )
    if cfg.config == "xnor_digits_a1":
        w = cfg.width or 128
        return (
            models.XNORConvNet(
                widths=(w, w), quantized=q,
                binarize_inputs=True,  # full-XNOR: A1 activations
                fp32_first_last=True,  # paper-standard first/last rule
            ),
            (8, 8, 1),
            "digits",
        )
    if cfg.config == "xnor_digits":
        return (
            models.XNORConvNet(
                widths=(32, 64), quantized=q,
                binarize_inputs=cfg.a_bits >= 1,
                fp32_first_last=True,  # paper-standard first/last rule
            ),
            (8, 8, 1),
            "digits",
        )
    if cfg.config in ("bnn_lenet", "bnn_lenet_as"):
        return (
            models.BNNLeNet(
                quantized=q,
                width=cfg.width or 32,
                act_scale=cfg.config.endswith("_as"),
            ),
            (28, 28, 1),
            "mnist",
        )
    if cfg.config == "xnor_cifar":
        return models.XNORConvNet(quantized=q), (32, 32, 3), "cifar10"
    if cfg.config == "dorefa_resnet20_w4":
        return (
            models.DorefaResNet20(
                w_bits=cfg.w_bits, a_bits=0, quantized=q
            ),
            (32, 32, 3),
            "cifar10",
        )
    if cfg.config == "dorefa_resnet20":
        return (
            models.DorefaResNet20(
                w_bits=cfg.w_bits, a_bits=cfg.a_bits, a_quant=cfg.a_quant,
                quantized=q,
            ),
            (32, 32, 3),
            "cifar10",
        )
    if cfg.config == "logquant_vgg":
        return (
            models.LogQuantVGGSmall(bits=cfg.w_bits, fsr=cfg.fsr, quantized=q),
            (32, 32, 3),
            "cifar10",
        )
    raise ValueError(
        f"unknown config {cfg.config!r}; pick from {sorted(SCHEME_CONFIGS)}"
    )
