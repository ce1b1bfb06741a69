"""Unit tests for BinaryConnect quantizers.

Mirrors the reference's ``test_binary_connect.py`` matrix (SURVEY.md §4):
forward values on hand-constructed tensors, STE cotangents via ``jax.grad``
against hand-computed arrays, statistical checks for the stochastic variant
with fixed PRNG keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import ops


def test_safe_sign_zero_is_plus_one():
    x = jnp.array([-2.0, -0.0, 0.0, 0.5, 3.0])
    np.testing.assert_array_equal(
        ops.safe_sign(x), jnp.array([-1.0, 1.0, 1.0, 1.0, 1.0])
    )


def test_det_forward_values():
    x = jnp.array([[0.3, -0.7], [0.0, -1.5]])
    np.testing.assert_array_equal(
        ops.binary_connect_det(x), jnp.array([[1.0, -1.0], [1.0, -1.0]])
    )


def test_det_clipped_ste_gradient():
    x = jnp.array([0.5, -0.5, 1.5, -2.0, 1.0])
    g = jax.grad(lambda x: jnp.sum(ops.binary_connect_det(x) * jnp.arange(1.0, 6.0)))(x)
    # upstream grad is [1..5]; cancelled where |x| > 1
    np.testing.assert_array_equal(g, jnp.array([1.0, 2.0, 0.0, 0.0, 5.0]))


def test_det_identity_ste_gradient():
    x = jnp.array([0.5, 1.5, -2.0])
    g = jax.grad(lambda x: jnp.sum(ops.binary_connect_det(x, ste_mode="identity")))(x)
    np.testing.assert_array_equal(g, jnp.ones(3))


def test_hard_sigmoid():
    x = jnp.array([-3.0, -1.0, 0.0, 0.5, 1.0, 2.0])
    np.testing.assert_allclose(
        ops.hard_sigmoid(x), jnp.array([0.0, 0.0, 0.5, 0.75, 1.0, 1.0])
    )


def test_stoch_support_and_mean():
    key = jax.random.PRNGKey(0)
    w = jnp.full((20000,), 0.4)
    out = ops.binary_connect_stoch(w, key)
    assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}
    # E[out] = 2*hard_sigmoid(0.4) - 1 = 0.4
    assert abs(float(out.mean()) - 0.4) < 0.02


def test_stoch_extremes_deterministic():
    key = jax.random.PRNGKey(1)
    w = jnp.array([-2.0, 2.0] * 100)
    out = ops.binary_connect_stoch(w, key)
    np.testing.assert_array_equal(out, jnp.array([-1.0, 1.0] * 100))


def test_stoch_gradient_is_ste():
    key = jax.random.PRNGKey(2)
    x = jnp.array([0.5, 1.5, -0.2])
    g = jax.grad(lambda x: jnp.sum(ops.binary_connect_stoch(x, key)))(x)
    np.testing.assert_array_equal(g, jnp.array([1.0, 0.0, 1.0]))


def test_stoch_reproducible_with_key():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(jax.random.PRNGKey(9), (64,))
    np.testing.assert_array_equal(
        ops.binary_connect_stoch(w, key), ops.binary_connect_stoch(w, key)
    )


def test_binary_tanh_matches_bnn_paper():
    x = jnp.array([0.99, -0.99, 1.01, -1.01])
    y, vjp = jax.vjp(ops.binary_tanh, x)
    np.testing.assert_array_equal(y, jnp.array([1.0, -1.0, 1.0, -1.0]))
    (g,) = vjp(jnp.ones_like(x))
    np.testing.assert_array_equal(g, jnp.array([1.0, 1.0, 0.0, 0.0]))


def test_factory():
    det = ops.binary_connect(deterministic=True)
    stoch = ops.binary_connect(deterministic=False)
    x = jnp.array([0.3, -0.3])
    np.testing.assert_array_equal(det(x), jnp.array([1.0, -1.0]))
    out = stoch(x, jax.random.PRNGKey(0))
    assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}


def test_idempotence():
    x = jax.random.normal(jax.random.PRNGKey(0), (128,))
    q = ops.binary_connect_det(x)
    np.testing.assert_array_equal(ops.binary_connect_det(q), q)


def test_jit_compatible():
    f = jax.jit(jax.grad(lambda x: jnp.sum(ops.binary_connect_det(x))))
    g = f(jnp.array([0.5, 2.0]))
    np.testing.assert_array_equal(g, jnp.array([1.0, 0.0]))
