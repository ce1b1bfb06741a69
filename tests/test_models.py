"""Model zoo smoke tests: init/forward shapes + one fused train step each
(BASELINE configs 1-5 on tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_quantize_impls_tpu import models, train

KEY = jax.random.PRNGKey(0)


def _one_step(model, x, y, has_quant_rng=False):
    variables = model.init({"params": KEY, "quant": KEY}, x, train=True)
    tx = optax.chain(optax.adam(1e-3), train.clip_quantized_weights())
    state = train.QuantTrainState.create_for(model, variables, tx)
    step = train.make_train_step(has_quant_rng=has_quant_rng, donate=False)
    state2, metrics = step(state, (x, y))
    assert np.isfinite(float(metrics["loss"]))
    # params moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # clamp held: every kernel within [-1, 1] (models here use bound-1 layers
    # except log/lin which allow ±2^fsr — covered separately)
    return state2


def test_binary_connect_mlp():
    x = jax.random.normal(KEY, (8, 28 * 28))
    y = jnp.arange(8) % 10
    model = models.BinaryConnectMLP(hidden=32)
    out = model.init_with_output({"params": KEY}, x, train=False)[0]
    assert out.shape == (8, 10)
    state = _one_step(model, x, y)
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        if "kernel" in jax.tree_util.keystr(path):
            assert float(jnp.abs(leaf).max()) <= 1.0 + 1e-6


def test_binary_connect_mlp_stochastic():
    x = jax.random.normal(KEY, (8, 28 * 28))
    y = jnp.arange(8) % 10
    model = models.BinaryConnectMLP(hidden=32, deterministic=False)
    _one_step(model, x, y, has_quant_rng=True)


def test_bnn_lenet():
    x = jax.random.normal(KEY, (4, 28, 28, 1))
    y = jnp.arange(4) % 10
    model = models.BNNLeNet(width=8)
    out = model.init_with_output({"params": KEY}, x, train=False)[0]
    assert out.shape == (4, 10)
    _one_step(model, x, y)


def test_xnor_convnet():
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    y = jnp.arange(2)
    model = models.XNORConvNet(widths=(8, 8, 16, 16))
    out = model.init_with_output({"params": KEY}, x, train=False)[0]
    assert out.shape == (2, 10)
    _one_step(model, x, y)


def test_dorefa_resnet20():
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    y = jnp.arange(2)
    model = models.DorefaResNet20(width=8)
    out = model.init_with_output({"params": KEY}, x, train=False)[0]
    assert out.shape == (2, 10)
    _one_step(model, x, y)


def test_log_vgg_small():
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    y = jnp.arange(2)
    model = models.LogQuantVGGSmall(widths=(8, 8, 16, 16), bits=4, fsr=1.0)
    out = model.init_with_output({"params": KEY}, x, train=False)[0]
    assert out.shape == (2, 10)
    _one_step(model, x, y)


def test_fp32_twins_exist():
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    for m in [
        models.BNNLeNet(width=8, quantized=False),
        models.XNORConvNet(widths=(8, 8), quantized=False),
        models.DorefaResNet20(width=8, quantized=False),
        models.LogQuantVGGSmall(widths=(8, 8), quantized=False),
    ]:
        xx = jax.random.normal(KEY, (2, 28, 28, 1)) if isinstance(
            m, models.BNNLeNet
        ) else x
        out = m.init_with_output({"params": KEY}, xx, train=False)[0]
        assert out.shape == (2, 10)


def test_resnet_remat_matches_plain():
    """remat=True must be numerically identical (it only changes what the
    backward pass rematerializes, not the math)."""
    import optax
    from pytorch_quantize_impls_tpu import train

    x = jax.random.normal(KEY, (4, 32, 32, 3))
    y = jnp.arange(4) % 10
    losses = []
    for remat in (False, True):
        model = models.DorefaResNet20(w_bits=4, a_bits=4, width=8, remat=remat)
        v = model.init({"params": KEY}, x, train=True)
        tx = optax.chain(optax.adam(1e-3), train.clip_quantized_weights())
        st = train.QuantTrainState.create_for(model, v, tx)
        step = train.make_train_step(donate=False)
        st, m = step(st, (x, y))
        st, m2 = step(st, (x, y))  # second step exercises grads through remat
        losses.append((float(m["loss"]), float(m2["loss"])))
    assert losses[0] == losses[1], losses
