"""Unit tests for log/linear FSR quantizers (reference:
``test_log_lin_connect.py``, SURVEY.md §4; math arXiv:1603.01025)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_quantize_impls_tpu import ops
from pytorch_quantize_impls_tpu.ops.log_lin import (
    log_quant_exponent,
    log_quant_from_exponent,
)


def test_log_quant_powers_of_two():
    x = jnp.array([0.9, 1.1, 0.3, 2.7, -0.5])
    y = ops.log_quant(x, fsr=2.0, bits=4)
    mags = np.abs(np.asarray(y))
    np.testing.assert_allclose(np.log2(mags), np.round(np.log2(mags)), atol=1e-6)
    assert np.all(np.sign(np.asarray(y)) == [1, 1, 1, 1, -1])


def test_log_quant_exact_values():
    x = jnp.array([1.0, 2.0, 0.25, -4.0])
    np.testing.assert_allclose(
        ops.log_quant(x, fsr=3.0, bits=4), jnp.array([1.0, 2.0, 0.25, -4.0])
    )


def test_log_quant_clip_range():
    # fsr=0, bits=2 -> exponents in [-4, 0] -> mags in [2^-4, 1]
    x = jnp.array([100.0, 1e-8, 0.0])
    y = ops.log_quant(x, fsr=0.0, bits=2)
    np.testing.assert_allclose(y, jnp.array([1.0, 2.0**-4, 2.0**-4]))


def test_log_quant_no_sign():
    x = jnp.array([-2.0, 2.0])
    y = ops.log_quant(x, fsr=2.0, bits=4, with_sign=False)
    np.testing.assert_allclose(y, jnp.array([2.0, 2.0]))


def test_log_quant_lin_back_identity_ste():
    x = jnp.array([0.3, -1.7, 2.0])
    g = jax.grad(lambda x: jnp.sum(ops.log_quant(x, fsr=2.0, bits=4)))(x)
    np.testing.assert_allclose(g, jnp.ones(3))


def test_log_quant_scaled_back():
    x = jnp.array([1.0, 2.0])  # exactly on levels -> scale 1
    g = jax.grad(
        lambda x: jnp.sum(ops.log_quant(x, fsr=2.0, bits=4, lin_back=False))
    )(x)
    np.testing.assert_allclose(g, jnp.ones(2), rtol=1e-6)


def test_lin_quant_grid():
    # fsr=0, bits=2 -> step 0.25, bound 1
    x = jnp.array([0.1, 0.13, -0.3, 5.0, -5.0])
    y = ops.lin_quant(x, fsr=0.0, bits=2)
    np.testing.assert_allclose(y, jnp.array([0.0, 0.25, -0.25, 1.0, -1.0]))


def test_lin_quant_identity_ste():
    x = jnp.array([0.3, -1.7])
    g = jax.grad(lambda x: jnp.sum(ops.lin_quant(x, fsr=1.0, bits=3)))(x)
    np.testing.assert_allclose(g, jnp.ones(2))


def test_exponent_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (256,))
    fsr, bits = 1.0, 4
    s, idx = log_quant_exponent(x, fsr, bits)
    y = log_quant_from_exponent(s, idx, fsr, bits)
    np.testing.assert_allclose(y, ops.log_quant(x, fsr, bits), rtol=1e-6)


def test_idempotence():
    x = jax.random.normal(jax.random.PRNGKey(0), (256,))
    q = ops.log_quant(x, fsr=1.0, bits=4)
    np.testing.assert_allclose(ops.log_quant(q, fsr=1.0, bits=4), q, rtol=1e-6)
    ql = ops.lin_quant(x, fsr=1.0, bits=4)
    np.testing.assert_allclose(ops.lin_quant(ql, fsr=1.0, bits=4), ql, rtol=1e-6)
