"""Unit tests for elastic penalties and XNOR scaling math (SURVEY.md §2-L0)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_quantize_impls_tpu import ops


def test_binary_elastic_zero_on_grid():
    w = jnp.array([1.0, -1.0, 1.0])
    assert float(ops.binary_elastic_loss(w)) == 0.0


def test_binary_elastic_pulls_toward_levels():
    w = jnp.array([0.6, -0.2])
    g = jax.grad(ops.binary_elastic_loss)(w)
    # 0.6 is nearest +1: gradient negative (descent increases w toward 1)
    assert g[0] < 0
    # -0.2 is nearest -1: gradient positive (descent decreases w toward -1)
    assert g[1] > 0


def test_lin_elastic_zero_on_grid():
    w = jnp.array([0.25, -0.5, 0.0])
    assert float(ops.lin_elastic_loss(w, fsr=0.0, bits=2)) < 1e-12


def test_log_elastic_zero_on_grid():
    w = jnp.array([1.0, -0.5, 0.25])
    assert float(ops.log_elastic_loss(w, fsr=1.0, bits=4)) < 1e-12


def test_elastic_w_shape():
    # penalty is W-shaped: max midway between levels
    losses = [
        float(ops.binary_elastic_loss(jnp.array([v])))
        for v in (-1.0, -0.5, 0.0, 0.5, 1.0)
    ]
    assert losses[0] == losses[4] == 0.0
    assert losses[2] == max(losses)


def test_xnor_alpha_per_channel():
    w = jnp.array([[1.0, -2.0], [3.0, 4.0]])  # (in, out)
    a = ops.xnor_alpha(w, channel_axis=-1)
    np.testing.assert_allclose(a, jnp.array([[2.0, 3.0]]))


def test_xnor_quantize_value():
    w = jnp.array([[1.0, -2.0], [3.0, -4.0]])
    q = ops.xnor_quantize(w, channel_axis=-1)
    np.testing.assert_allclose(q, jnp.array([[2.0, -3.0], [2.0, -3.0]]))


def test_xnor_alpha_gradient_differentiable():
    # gradient flows through alpha (paper: 1/n term) AND the sign STE
    w = jnp.array([[0.5, -0.5]])
    g = jax.grad(lambda w: jnp.sum(ops.xnor_quantize(w)))(w)
    assert np.all(np.isfinite(np.asarray(g)))
    assert not np.allclose(np.asarray(g), 0.0)


def test_xnor_input_scale_map_shape_and_value():
    x = jnp.ones((2, 8, 8, 3))
    k = ops.xnor_input_scale_map(x, (3, 3))
    assert k.shape == (2, 8, 8, 1)
    # interior of all-ones input: K == 1
    np.testing.assert_allclose(k[:, 2:-2, 2:-2, :], 1.0, rtol=1e-6)
