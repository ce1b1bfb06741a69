"""Unit tests for TernaryConnect (reference: ``test_terner_connect.py``;
SURVEY.md §2/§4 — file name kept for parity with the reference's spelling)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_quantize_impls_tpu import ops


def test_det_forward_thresholds():
    x = jnp.array([-1.4, -0.6, -0.4, 0.0, 0.4, 0.6, 1.4])
    np.testing.assert_array_equal(
        ops.ternary_connect_det(x),
        jnp.array([-1.0, -1.0, 0.0, 0.0, 0.0, 1.0, 1.0]),
    )


def test_det_support():
    x = jax.random.normal(jax.random.PRNGKey(0), (1000,))
    out = np.unique(np.asarray(ops.ternary_connect_det(x)))
    assert set(out) <= {-1.0, 0.0, 1.0}


def test_det_ste_gradient_clipped():
    x = jnp.array([0.2, -1.5, 0.9])
    g = jax.grad(lambda x: jnp.sum(ops.ternary_connect_det(x)))(x)
    np.testing.assert_array_equal(g, jnp.array([1.0, 0.0, 1.0]))


def test_stoch_mean_matches_probability():
    # E[q] = clip(w, -1, 1): P(sign level) = |w|
    key = jax.random.PRNGKey(0)
    w = jnp.full((20000,), 0.3)
    out = ops.ternary_connect_stoch(w, key)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
    assert abs(float(out.mean()) - 0.3) < 0.02
    w = jnp.full((20000,), -0.7)
    out = ops.ternary_connect_stoch(w, jax.random.PRNGKey(1))
    assert set(np.unique(np.asarray(out))) <= {-1.0, 0.0}
    assert abs(float(out.mean()) + 0.7) < 0.02


def test_stoch_gradient_is_ste():
    key = jax.random.PRNGKey(2)
    x = jnp.array([0.5, 1.5, -0.2])
    g = jax.grad(lambda x: jnp.sum(ops.ternary_connect_stoch(x, key)))(x)
    np.testing.assert_array_equal(g, jnp.array([1.0, 0.0, 1.0]))


def test_idempotence():
    x = jax.random.normal(jax.random.PRNGKey(0), (256,))
    q = ops.ternary_connect_det(x)
    np.testing.assert_array_equal(ops.ternary_connect_det(q), q)
