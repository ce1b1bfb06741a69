"""Property tests over the whole quantizer zoo (SURVEY.md §4 item 1:
idempotence, domain membership, monotonicity — hypothesis-driven)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pytorch_quantize_impls_tpu import ops

ARRS = st.lists(
    st.floats(-4.0, 4.0, allow_nan=False, width=32), min_size=1, max_size=64
).map(lambda v: np.asarray(v, np.float32))


QUANTIZERS = {
    "binary_det": lambda x: ops.binary_connect_det(x),
    "ternary_det": lambda x: ops.ternary_connect_det(x),
    "dorefa_w4": lambda x: ops.dorefa_weight(x, 4),
    "dorefa_a4": lambda x: ops.dorefa_activation(x, 4),
    "lin_q4": lambda x: ops.lin_quant(x, fsr=1.0, bits=4),
    "log_q4": lambda x: ops.log_quant(x, fsr=1.0, bits=4),
    "pact4": lambda x: ops.pact(x, 2.0, bits=4),
}

DOMAINS = {
    "binary_det": lambda y: np.all(np.isin(y, [-1.0, 1.0])),
    "ternary_det": lambda y: np.all(np.isin(y, [-1.0, 0.0, 1.0])),
    "dorefa_w4": lambda y: np.all((y >= -1 - 1e-6) & (y <= 1 + 1e-6)),
    "dorefa_a4": lambda y: np.all((y >= 0) & (y <= 1 + 1e-6)),
    "lin_q4": lambda y: np.all(np.abs(y) <= 2.0 + 1e-6),
    "log_q4": lambda y: np.all(np.abs(y) <= 2.0 + 1e-6),
    "pact4": lambda y: np.all((y >= 0) & (y <= 2.0 + 1e-6)),
}

MONOTONE = [
    "binary_det", "ternary_det", "dorefa_a4", "lin_q4", "pact4",
]  # dorefa_w4 normalizes by max|tanh| (not pointwise); log quantizes |x|


@pytest.mark.parametrize("name", sorted(QUANTIZERS))
@settings(max_examples=25, deadline=None)
@given(x=ARRS)
def test_idempotent_and_in_domain(name, x):
    q = QUANTIZERS[name]
    y = np.asarray(q(jnp.asarray(x)))
    assert DOMAINS[name](y), y
    if name == "dorefa_w4":
        # not idempotent pointwise (tanh renormalization); check domain only
        return
    y2 = np.asarray(q(jnp.asarray(y)))
    np.testing.assert_allclose(y2, y, atol=1e-5)


@pytest.mark.parametrize("name", MONOTONE)
@settings(max_examples=25, deadline=None)
@given(x=ARRS)
def test_monotone(name, x):
    q = QUANTIZERS[name]
    xs = np.sort(x)
    y = np.asarray(q(jnp.asarray(xs)))
    assert np.all(np.diff(y) >= -1e-6)


@settings(max_examples=25, deadline=None)
@given(x=ARRS)
def test_binary_stoch_support_and_mean(x):
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    draws = np.stack([
        np.asarray(ops.binary_connect_stoch(jnp.asarray(x), k)) for k in keys
    ])
    assert np.all(np.isin(draws, [-1.0, 1.0]))
    p = np.asarray(ops.hard_sigmoid(jnp.asarray(x)))
    mean = draws.mean(0)
    np.testing.assert_allclose(mean, 2 * p - 1, atol=0.5)


@settings(max_examples=10, deadline=None)
@given(x=ARRS)
def test_ste_gradient_bounded(x):
    """All STE backward passes pass bounded gradients (no blowup).

    DoReFa's weight transform normalizes by max|tanh(W)|, so its gradient
    legitimately scales like 1/max|tanh(x)| when all weights are tiny
    (the paper's transform; finite for any nonzero input) — bound it
    relative to that factor instead of an absolute constant.
    """
    for name, q in QUANTIZERS.items():
        g = np.asarray(
            jax.grad(lambda t: jnp.sum(q(t)))(jnp.asarray(x))
        )
        assert np.all(np.isfinite(g)), name
        bound = 16.0
        if name == "dorefa_w4":
            m = float(np.max(np.abs(np.tanh(x))))
            bound = 16.0 if m == 0.0 else max(16.0, 2.0 / m)
        assert np.max(np.abs(g)) <= bound + 1e-4, (name, g)
