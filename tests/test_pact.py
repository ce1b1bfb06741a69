"""PACT (arXiv:1805.06085): forward grid, STE gradients, layer training."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_quantize_impls_tpu import nn as qnn
from pytorch_quantize_impls_tpu import ops


class TestPactForward:
    def test_grid_values(self):
        # k=2 over [0, 3]: levels {0, 1, 2, 3}
        x = jnp.asarray([-1.0, 0.4, 1.6, 2.6, 5.0])
        y = ops.pact(x, 3.0, bits=2)
        np.testing.assert_allclose(np.asarray(y), [0.0, 0.0, 2.0, 3.0, 3.0])

    def test_idempotent(self):
        x = jnp.linspace(-2, 10, 97)
        y = ops.pact(x, 6.0, bits=4)
        np.testing.assert_allclose(np.asarray(ops.pact(y, 6.0, bits=4)),
                                   np.asarray(y), atol=1e-6)

    def test_fp32_passthrough_is_clip(self):
        x = jnp.asarray([-1.0, 0.5, 7.0])
        np.testing.assert_allclose(
            np.asarray(ops.pact(x, 6.0, bits=32)), [0.0, 0.5, 6.0]
        )

    def test_levels_count(self):
        x = jnp.linspace(0, 6, 1000)
        y = ops.pact(x, 6.0, bits=3)
        assert len(np.unique(np.asarray(y))) == 2**3


class TestPactGrad:
    def test_dx_inside_one_outside_zero(self):
        x = jnp.asarray([-0.5, 0.5, 3.0, 7.0])
        g = jax.grad(lambda x: jnp.sum(ops.pact(x, 6.0, bits=4)))(x)
        np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 1.0, 0.0])

    def test_dalpha_only_from_clipped(self):
        x = jnp.asarray([-0.5, 0.5, 5.9, 6.0, 7.0])
        g = jax.grad(
            lambda a: jnp.sum(ops.pact(x, a, bits=4)), argnums=0
        )(jnp.asarray(6.0))
        # paper: dy/dalpha = 1 exactly where x >= alpha -> two entries here
        np.testing.assert_allclose(float(g), 2.0)

    def test_alpha_penalty(self):
        assert float(ops.pact_alpha_penalty(jnp.asarray(3.0))) == 9.0


class TestPactLayer:
    def test_alpha_learns(self):
        import flax.linen as fnn

        class Net(fnn.Module):
            @fnn.compact
            def __call__(self, x, train=True):
                x = fnn.Dense(16)(x)
                x = qnn.PACT(bits=4, alpha_init=6.0)(x, train=train)
                return fnn.Dense(4)(x)

        net = Net()
        x = np.random.default_rng(0).normal(size=(64, 8)).astype(np.float32) * 4
        y = (np.arange(64) % 4).astype(np.int32)
        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
        params = variables["params"]
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        def loss_fn(p):
            logits = net.apply({"params": p}, jnp.asarray(x))
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(y)
            ).mean()
            return ce

        a0 = float(jax.tree_util.tree_leaves(
            {k: v for k, v in params.items() if "PACT" in k}
        )[0])
        losses = []
        for _ in range(30):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        a1 = float(jax.tree_util.tree_leaves(
            {k: v for k, v in params.items() if "PACT" in k}
        )[0])
        assert losses[-1] < losses[0]
        assert a1 != a0  # alpha received gradient and moved
