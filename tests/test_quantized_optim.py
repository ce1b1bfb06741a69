"""Block-wise 8-bit Adam (train/quantized_optim.py).

NEW scope beyond the reference (no optimizer subsystem there — SURVEY.md
§2-L2): verify the quantized-moment Adam (a) matches fp32 Adam's short-run
trajectory closely, (b) trains the BASELINE config-1 model to the same
accuracy, (c) actually stores 8-bit state, (d) composes with the
clamp-after-step transform and jit.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_quantize_impls_tpu import data, models, train
from pytorch_quantize_impls_tpu.train import (
    Quantized8,
    optimizer_state_bytes,
    quantized_adam,
)


def _quadratic_params():
    return {
        "w": jnp.asarray(
            np.random.default_rng(0).normal(size=(1024,)).astype(np.float32)
        ),
        "b": jnp.zeros((8,)),  # tiny leaf: stays fp32 inside the optimizer
    }


def test_matches_fp32_adam_short_run():
    params_q = _quadratic_params()
    params_f = jax.tree_util.tree_map(jnp.copy, params_q)
    target = jnp.linspace(-1, 1, 1024)

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean(p["b"] ** 2)

    tx_q = quantized_adam(1e-2)
    tx_f = optax.adam(1e-2)
    s_q = tx_q.init(params_q)
    s_f = tx_f.init(params_f)

    @partial(jax.jit, static_argnames=("which",))
    def step(p, s, which):
        g = jax.grad(loss)(p)
        if which == "q":
            u, s = tx_q.update(g, s)
        else:
            u, s = tx_f.update(g, s)
        return optax.apply_updates(p, u), s

    for _ in range(50):
        params_q, s_q = step(params_q, s_q, "q")
        params_f, s_f = step(params_f, s_f, "f")

    # both heading to the same optimum, trajectories close (the ~3% per-step
    # relative code error accumulates; what matters is no divergence)
    np.testing.assert_allclose(
        np.asarray(params_q["w"]), np.asarray(params_f["w"]), atol=5e-2
    )
    assert float(loss(params_q)) < 0.5 * float(
        jnp.mean((jnp.asarray(_quadratic_params()["w"]) - target) ** 2)
    )


def test_state_is_8bit_and_smaller():
    params = {"k": jnp.zeros((4096, 64))}
    s = quantized_adam().init(params)
    assert isinstance(s.mu["k"], Quantized8)
    assert s.mu["k"].codes.dtype == jnp.int8
    assert s.nu["k"].codes.dtype == jnp.uint8
    qbytes = optimizer_state_bytes(s)
    fbytes = optimizer_state_bytes(optax.adam(1e-3).init(params))
    assert qbytes < 0.3 * fbytes  # ~4x smaller (scales cost a little)


def test_trains_binaryconnect_mlp_to_fp32_adam_accuracy():
    """BASELINE config 1 trained with 8-bit Adam reaches the same accuracy
    as fp32 Adam under the identical schedule + clamp chain."""
    (xtr, ytr), (xte, yte) = data.mnist(flatten=True)
    accs = {}
    for name, opt in [
        ("adam8", quantized_adam(3e-3)),
        ("adam32", optax.adam(3e-3)),
    ]:
        model = models.BinaryConnectMLP(hidden=64)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.asarray(xtr[:1]), train=True
        )
        tx = optax.chain(opt, train.clip_quantized_weights())
        state = train.QuantTrainState.create_for(model, variables, tx)
        step = train.make_train_step(donate=False)
        for i, (bx, by) in enumerate(data.iterate_batches((xtr, ytr), 128)):
            if i >= 80:
                break
            state, _ = step(state, (jnp.asarray(bx), jnp.asarray(by)))
        ev = train.make_eval_step()(
            state, (jnp.asarray(xte[:512]), jnp.asarray(yte[:512]))
        )
        accs[name] = float(ev["accuracy"])
        # clamp composed: master kernels stayed in the quantizer domain
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
            if "kernel" in jax.tree_util.keystr(path):
                assert float(jnp.max(jnp.abs(leaf))) <= 1.0 + 1e-6
    assert accs["adam8"] >= accs["adam32"] - 0.02, accs


def test_roundtrip_encode_decode_error_bounded():
    from pytorch_quantize_impls_tpu.train.quantized_optim import (
        _decode,
        _encode,
    )

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1000,)).astype(np.float32)
    )
    for signed, rel_bound in ((True, 0.04), (False, 0.04)):
        v = x if signed else jnp.abs(x)
        q = _encode(v, 256, signed)
        back = _decode(q, v.shape)
        # log code: bounded RELATIVE error for entries above the block
        # floor (absmax * 2^-R); entries below decode to the floor, whose
        # absolute size is negligible vs the block absmax
        absmax = jnp.repeat(q.scale, 256)[: v.size]
        floor = absmax * 2.0 ** (-12.0 if signed else -24.0)
        big = jnp.abs(v) >= floor
        rel = jnp.abs(back - v) / jnp.maximum(jnp.abs(v), 1e-30)
        assert float(jnp.max(jnp.where(big, rel, 0.0))) <= rel_bound
        assert float(jnp.max(jnp.where(big, 0.0, jnp.abs(back)))) <= float(
            jnp.max(floor) * 1.01
        )
        # sign and zero preserved
        np.testing.assert_array_equal(
            np.asarray(jnp.sign(back)), np.asarray(jnp.sign(v))
        )


@pytest.mark.parametrize("shape", [(7,), (256,), (300, 3)])
def test_odd_shapes_roundtrip(shape):
    from pytorch_quantize_impls_tpu.train.quantized_optim import (
        _decode,
        _encode,
    )

    x = jnp.asarray(
        np.random.default_rng(2).normal(size=shape).astype(np.float32)
    )
    q = _encode(x, 256, True)
    assert _decode(q, shape).shape == shape


def test_quantized_adam_under_dp_mesh():
    """The 8-bit state must ride the sharded train step (DP mesh): codes /
    scales are replicated alongside the replicated params."""
    from pytorch_quantize_impls_tpu import parallel

    mesh = parallel.make_mesh((8, 1))
    model = models.BinaryConnectMLP(hidden=16)
    x = np.random.default_rng(0).normal(size=(16, 784)).astype(np.float32)
    y = (np.arange(16) % 10).astype(np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x[:1]), train=True
    )
    tx = optax.chain(quantized_adam(1e-3), train.clip_quantized_weights())
    state = train.QuantTrainState.create_for(model, variables, tx)
    with mesh:
        state, step = parallel.make_sharded_train_step(state, mesh)
        xb, yb = parallel.shard_batch((x, y), mesh)
        state, metrics = step(state, (xb, yb))
        state, metrics = step(state, (xb, yb))
    assert np.isfinite(float(metrics["loss"]))
    # the quantized moments actually advanced
    leaves = [
        l
        for l in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(l, "dtype") and l.dtype in (jnp.int8, jnp.uint8)
    ]
    assert leaves and any(int(jnp.sum(jnp.abs(l.astype(jnp.int32)))) for l in leaves)
