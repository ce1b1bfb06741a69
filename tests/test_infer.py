"""Packed-inference parity (SURVEY.md §3.5 + §4-2a): for every model family,
``infer.packed_apply`` must match the fake-quant eval forward — exactly on
the integer paths, to bf16 tolerance on the decoded-bf16 paths."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import infer, models, nn as qnn

KEY = jax.random.PRNGKey(0)


def _check(model, x, rtol, atol, prepare=True):
    variables = model.init({"params": KEY}, x, train=False)
    ref = model.apply(variables, x, train=False)
    packed = infer.pack_model(model, variables, x[:1])
    assert packed, "no layers packed"
    if prepare:
        packed = infer.prepare(packed)
    got = infer.packed_apply(model, variables, packed, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=rtol, atol=atol)
    return packed


def test_mlp_binary_packed():
    x = jax.random.normal(KEY, (8, 784))
    _check(models.MLP(features=(64, 10), layer="bin"), x, 2e-2, 2e-2)


def test_bnn_lenet_packed():
    x = jax.random.normal(KEY, (4, 28, 28, 1))
    _check(models.BNNLeNet(width=8), x, 2e-2, 2e-2)


def test_xnor_convnet_packed():
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    _check(models.XNORConvNet(widths=(8, 8)), x, 2e-2, 2e-2)


def test_dorefa_resnet_packed():
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    _check(models.DorefaResNet20(width=8), x, 5e-2, 5e-2)


def test_log_vgg_packed():
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    _check(models.LogQuantVGGSmall(widths=(8, 8), bits=4, fsr=1.0), x, 5e-2, 5e-2)


def test_ternary_and_lin_layers_packed():
    x = jax.random.normal(KEY, (8, 64))

    for layer, tol in [
        (qnn.LinearTer(features=16), 2e-2),
        (qnn.LinearQuantLin(features=16, fsr=1.0, bits=4), 2e-2),
        (qnn.LinearQuantLog(features=16, fsr=1.0, bits=4), 2e-2),
        (qnn.LinearDorefa(features=16, bits=4), 2e-2),  # fp inputs
    ]:
        _check(layer, x, tol, tol)


def test_unprepared_fallback_matches():
    x = jax.random.normal(KEY, (4, 64))
    _check(qnn.LinearBin(features=16, binarize_input=True), x, 1e-4, 1e-4,
           prepare=False)


def test_save_load_roundtrip():
    x = jax.random.normal(KEY, (4, 784))
    model = models.MLP(features=(32, 10), layer="bin")
    variables = model.init({"params": KEY}, x, train=False)
    packed = infer.pack_model(model, variables, x[:1])
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "model.npz")
        infer.save_packed(p, packed)
        loaded = infer.load_packed(p)
    assert set(loaded) == set(packed)
    y1 = infer.packed_apply(model, variables, packed, x)
    y2 = infer.packed_apply(model, variables, loaded, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_packed_apply_jittable():
    x = jax.random.normal(KEY, (4, 784))
    model = models.MLP(features=(32, 10), layer="bin")
    variables = model.init({"params": KEY}, x, train=False)
    packed = infer.prepare(infer.pack_model(model, variables, x[:1]))

    @jax.jit
    def f(variables, packed, x):
        return infer.packed_apply(model, variables, packed, x)

    y = f(variables, packed, x)
    ref = infer.packed_apply(model, variables, packed, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_xnor_convnet_packed_bit_exact_deep():
    """The packed path must be BIT-exact vs fake-quant for XNOR convnets:
    both sides run an integer-valued conv (exact in fp32 accumulation) and
    the same alpha epilogue. Near-exact is not enough — BN outputs form a
    value lattice, and a lattice point within fp-rounding of zero flips
    hundreds of downstream sign binarizations at once (the r3 conv2
    divergence)."""
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    m = models.XNORConvNet(widths=(16, 16, 32, 32))
    v = m.init({"params": jax.random.PRNGKey(1)}, x[:1], train=False)
    packed = infer.prepare(infer.pack_model(m, v, x[:1]))
    yf = m.apply(v, x, train=False)
    yp = infer.packed_apply(m, v, packed, x)
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yp))


def test_bnn_lenet_packed_bit_exact():
    """Binary scheme (no alpha): packed conv/dense must be bit-identical to
    fake-quant — both paths run integer-exact math in f32 vs int32."""
    x = jax.random.normal(KEY, (2, 28, 28, 1))
    m = models.BNNLeNet()
    v = m.init({"params": jax.random.PRNGKey(1)}, x[:1], train=False)
    packed = infer.prepare(infer.pack_model(m, v, x[:1]))
    yf = m.apply(v, x, train=False)
    yp = infer.packed_apply(m, v, packed, x)
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yp))
