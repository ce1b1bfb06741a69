"""Aux subsystem tests: checkpoint/resume roundtrip, metrics writer, timer,
configs (SURVEY.md §5)."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_quantize_impls_tpu import models, train
from pytorch_quantize_impls_tpu.utils import (
    CheckpointManager,
    MetricsWriter,
    RunConfig,
    SCHEME_CONFIGS,
    StepTimer,
)
from pytorch_quantize_impls_tpu.utils.config import build_model

KEY = jax.random.PRNGKey(0)


def _state():
    model = models.MLP(features=(16, 10), layer="bin")
    x = jnp.ones((2, 32))
    variables = model.init({"params": KEY}, x)
    tx = optax.chain(optax.adam(1e-3), train.clip_quantized_weights())
    return model, x, train.QuantTrainState.create_for(model, variables, tx)


def test_checkpoint_roundtrip():
    model, x, state = _state()
    step = train.make_train_step(donate=False)
    y = jnp.arange(2) % 10
    state, _ = step(state, (x, y))
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, async_save=False)
        assert mgr.save(state, force=True)
        mgr.wait()
        assert mgr.latest_step() == 1

        _, _, fresh = _state()
        restored = mgr.restore(fresh)
        mgr.close()
    assert int(restored.step) == 1
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(restored.params)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), pa


def test_checkpoint_restore_empty_dir():
    _, _, state = _state()
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        assert mgr.restore(state) is None
        mgr.close()


def test_metrics_writer():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.jsonl")
        with MetricsWriter(p) as mw:
            mw.write(1, {"loss": jnp.asarray(0.5), "acc": 0.9})
            mw.write(2, {"loss": 0.4})
        lines = [json.loads(l) for l in open(p)]
    assert lines[0]["step"] == 1 and abs(lines[0]["loss"] - 0.5) < 1e-6
    assert lines[1]["step"] == 2


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    assert t.mean_s >= 0
    assert np.isfinite(t.throughput(128))


@pytest.mark.parametrize("name", sorted(SCHEME_CONFIGS))
def test_build_model_all_configs(name):
    cfg = RunConfig(**SCHEME_CONFIGS[name])
    model, shape, dataset = build_model(cfg)
    x = jnp.ones((1, *shape) if isinstance(shape, tuple) else (1, shape))
    out = model.init_with_output({"params": KEY}, x, train=False)[0]
    assert out.shape == (1, 10)
    twin, _, _ = build_model(cfg, fp32=True)
    out2 = twin.init_with_output({"params": KEY}, x, train=False)[0]
    assert out2.shape == (1, 10)


def test_checkpoint_roundtrip_quantized_adam():
    """8-bit optimizer state (Quantized8 pytrees with a static size field)
    must survive the orbax save/restore path like fp32 Adam state does."""
    model = models.BinaryConnectMLP(hidden=16)
    x = jnp.zeros((2, 784))
    variables = model.init({"params": KEY}, x)
    tx = optax.chain(
        train.quantized_adam(1e-3), train.clip_quantized_weights()
    )
    state = train.QuantTrainState.create_for(model, variables, tx)
    step = train.make_train_step(donate=False)
    y = jnp.arange(2) % 10
    state, _ = step(state, (x, y))
    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, async_save=False)
        assert mgr.save(state, force=True)
        mgr.wait()
        fresh = train.QuantTrainState.create_for(
            model, model.init({"params": KEY}, x), tx
        )
        restored = mgr.restore(fresh)
        mgr.close()
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.opt_state)[0],
        jax.tree_util.tree_flatten_with_path(restored.opt_state)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), pa
    # resumed training continues bit-compatibly
    s1, _ = step(state, (x, y))
    s2, _ = step(restored, (x, y))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s1.params)[0],
        jax.tree_util.tree_flatten_with_path(s2.params)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), pa
