"""Jittable train/eval step builders.

Reference training loop (SURVEY.md §3.3):
forward -> CE loss (+ elastic penalty) -> backward -> step -> clamp.
Here the whole thing is ONE jitted function — quantization, loss, STE
backward, optimizer update, and clamp all fuse into a single XLA program;
under a mesh the same function runs SPMD (see ``parallel``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from pytorch_quantize_impls_tpu.nn.base import collect_elastic_losses
from pytorch_quantize_impls_tpu.train.state import QuantTrainState


def cross_entropy(logits, labels):
    # Upcast: with a bf16 compute dtype (models' `dtype=jnp.bfloat16`) the
    # logits arrive bf16; the log-sum-exp must run in fp32 or the loss floor
    # is ~1e-2 off.
    logits = logits.astype(jnp.float32)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_compute_loss(
    state: QuantTrainState,
    x,
    y,
    *,
    elastic_weight: float = 0.0,
    loss_fn: Callable = cross_entropy,
    has_quant_rng: bool = False,
):
    """``params -> (loss, (logits, new_batch_stats))`` closure — the shared
    forward+loss used by every train-step flavor (jit/GSPMD and shard_map)."""

    def compute_loss(params):
        variables = {"params": params}
        mutable = ["losses"]
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
            mutable.append("batch_stats")
        rngs = {"quant": state.step_quant_key()} if has_quant_rng else None
        logits, aux = state.apply_fn(
            variables, x, train=True, mutable=mutable, rngs=rngs
        )
        loss = loss_fn(logits, y)
        if callable(elastic_weight):
            # schedule: lambda(step) — e.g. a linear ramp, the standard
            # loss-aware-quantization recipe (learn freely early, pull to
            # the grid late; a constant strong penalty fights the task
            # loss from step 0 and costs accuracy — measured r5 on the
            # elastic digits row: ramp -0.6% vs constant-30 -1.7%)
            loss = loss + elastic_weight(state.step) * collect_elastic_losses(aux)
        elif elastic_weight:
            loss = loss + elastic_weight * collect_elastic_losses(aux)
        return loss, (logits, aux.get("batch_stats"))

    return compute_loss


def make_train_step(
    *,
    elastic_weight: float = 0.0,
    loss_fn: Callable = cross_entropy,
    has_batch_stats: bool = True,
    has_quant_rng: bool = False,
    donate: bool = True,
    jit: bool = True,
):
    """Build a jitted ``(state, batch) -> (state, metrics)`` train step.

    ``batch`` is ``(inputs, integer labels)``. The elastic penalty (if any)
    is collected from the model's 'losses' collection and added with weight
    ``elastic_weight``.
    """

    def step(state: QuantTrainState, batch):
        x, y = batch
        compute_loss = make_compute_loss(
            state, x, y,
            elastic_weight=elastic_weight, loss_fn=loss_fn,
            has_quant_rng=has_quant_rng,
        )
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return state, {"loss": loss, "accuracy": acc}

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(jit: bool = True):
    """Build a jitted ``(state, batch) -> metrics`` eval step (frozen
    quantized weights — deterministic quantizers, running batch stats)."""

    def step(state: QuantTrainState, batch):
        x, y = batch
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits = state.apply_fn(variables, x, train=False)
        return {
            "loss": cross_entropy(logits, y),
            "accuracy": jnp.mean(jnp.argmax(logits, -1) == y),
            "count": jnp.asarray(y.shape[0]),
        }

    return jax.jit(step) if jit else step
