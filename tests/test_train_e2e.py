"""End-to-end training slice (SURVEY.md §7 step 3): BinaryConnect MLP learns a
synthetic MNIST-shaped task, with accuracy close to its fp32 twin, and the
clamp-after-step invariant holds throughout.

With real MNIST on disk (QTPU_DATA_DIR) the full parity harness lives in
``scripts/train.py``; this test keeps CI self-contained.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_quantize_impls_tpu import data, models, train

HIDDEN = 64
STEPS = 250
BATCH = 128


def _train(model, train_data, test_data, steps=STEPS, lr=3e-3):
    x0 = jnp.asarray(train_data[0][:1])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=True)
    tx = optax.chain(optax.adam(lr), train.clip_quantized_weights())
    state = train.QuantTrainState.create_for(model, variables, tx)
    step = train.make_train_step(donate=False)
    for batch in data.iterate_batches(train_data, BATCH, epochs=None):
        if state.step >= steps:
            break
        state, metrics = step(state, (jnp.asarray(batch[0]), jnp.asarray(batch[1])))
    eval_step = train.make_eval_step()
    m = eval_step(state, (jnp.asarray(test_data[0]), jnp.asarray(test_data[1])))
    return state, float(m["accuracy"])


@pytest.fixture(scope="module")
def mnist_small():
    (xtr, ytr), (xte, yte) = data.synthetic_image_classification(
        (28, 28, 1), 10, 6400, 1280, seed=3
    )
    xtr, xte = xtr.reshape(len(xtr), -1), xte.reshape(len(xte), -1)
    return (xtr, ytr), (xte[:512], yte[:512])


def test_binary_mlp_learns_and_matches_fp32(mnist_small):
    tr, te = mnist_small
    q_model = models.MLP(features=(HIDDEN, HIDDEN, 10), layer="bin")
    f_model = models.MLP(features=(HIDDEN, HIDDEN, 10), layer="fp32")
    state, q_acc = _train(q_model, tr, te)
    _, f_acc = _train(f_model, tr, te)
    assert q_acc > 0.8, f"quantized model failed to learn: {q_acc}"
    # Δacc target is 0.5% on real MNIST at full scale; small model + short
    # schedule gets a looser CI bound.
    assert q_acc >= f_acc - 0.05, f"quantized {q_acc} vs fp32 {f_acc}"
    # clamp invariant held across all steps
    for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
        if "kernel" in jax.tree_util.keystr(path):
            assert float(jnp.abs(leaf).max()) <= 1.0 + 1e-6


def test_dorefa_mlp_learns(mnist_small):
    tr, te = mnist_small
    model = models.MLP(features=(HIDDEN, 10), layer="dorefa", bits=4)
    _, acc = _train(model, tr, te, steps=200)
    assert acc > 0.8, acc


def test_binary_mlp_learns_real_digits():
    """REAL-data anchor: sklearn's bundled handwritten digits (data.digits).

    The only real image data on this machine (SURVEY.md §0: no network); a
    binarized MLP must reach >90% test accuracy on it.
    """
    tr, te = data.digits(flatten=True)
    model = models.MLP(features=(128, 128, 10), layer="bin")
    _, acc = _train(model, tr, te, steps=300)
    assert acc > 0.9, f"binary MLP on real digits: {acc}"


def test_stochastic_binary_mlp_learns(mnist_small):
    """Regression: stochastic BinaryConnect must actually train.

    Two failure modes this pins down: (a) a stochastically re-drawn HEAD
    layer emits noise logits of std ~sqrt(fan_in) that swamp the CE signal
    (MLP defaults the head to the deterministic twin); (b) eval must use the
    clipped real-valued master weights (BinaryConnect §2.4 test-time option
    for stochastic — E[W_b] = w), not sign(w). With either wrong, accuracy
    sits at chance (~0.1); with both right this task trains to ~1.0.
    """
    tr, te = mnist_small
    model = models.MLP(features=(256, 256, 10), layer="bin_stoch")

    x0 = jnp.asarray(tr[0][:1])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)},
        x0, train=True,
    )
    tx = optax.chain(
        optax.adam(optax.cosine_decay_schedule(3e-3, 600)),
        train.clip_quantized_weights(),
    )
    state = train.QuantTrainState.create_for(model, variables, tx)
    step = train.make_train_step(donate=False, has_quant_rng=True)
    for i, batch in enumerate(data.iterate_batches(tr, BATCH, epochs=None)):
        if i >= 600:
            break
        state, _ = step(state, (jnp.asarray(batch[0]), jnp.asarray(batch[1])))
    m = train.make_eval_step()(state, (jnp.asarray(te[0]), jnp.asarray(te[1])))
    assert float(m["accuracy"]) > 0.9, float(m["accuracy"])


def test_elastic_training_pulls_weights_to_grid(mnist_small):
    import flax.linen as fnn
    from pytorch_quantize_impls_tpu import nn as qnn

    tr, te = mnist_small

    class ElasticMLP(fnn.Module):
        @fnn.compact
        def __call__(self, x, train: bool = True):
            x = qnn.ElasticLinear(features=HIDDEN, grid="binary", name="l0")(x)
            x = fnn.BatchNorm(use_running_average=not train, name="bn")(x)
            x = fnn.relu(x)
            return qnn.ElasticLinear(features=10, grid="binary", name="head")(x)

    model = ElasticMLP()
    x0 = jnp.asarray(tr[0][:1])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, train=True)
    tx = optax.chain(optax.adam(3e-3), train.clip_quantized_weights())
    state = train.QuantTrainState.create_for(model, variables, tx)
    step = train.make_train_step(elastic_weight=1.0, donate=False)

    def mean_grid_dist(params):
        k = params["l0"]["kernel"]
        return float(jnp.mean(jnp.abs(jnp.abs(k) - 1.0)))

    d0 = mean_grid_dist(state.params)
    for i, batch in enumerate(data.iterate_batches(tr, BATCH, epochs=None)):
        if i >= 200:
            break
        state, _ = step(state, (jnp.asarray(batch[0]), jnp.asarray(batch[1])))
    d1 = mean_grid_dist(state.params)
    assert d1 < d0, (d0, d1)  # penalty pulled weights toward ±1
