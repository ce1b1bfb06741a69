"""ops.get_quantizer dispatcher: every scheme resolves and round-trips
against its underlying op (reference's generic Quant dispatcher, SURVEY.md
§2 L0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import ops

RNG = np.random.default_rng(7)
X = jnp.asarray(RNG.normal(size=(16, 32)).astype(np.float32))
KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("scheme", ops.SCHEMES)
def test_all_schemes_resolve_and_run(scheme):
    knobs = {}
    if scheme.startswith("dorefa") or scheme in ("log", "lin"):
        knobs["bits"] = 4
    q = ops.get_quantizer(scheme, **knobs)
    out = q(X, KEY) if scheme in ops.STOCHASTIC_SCHEMES else q(X)
    assert out.shape == X.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dispatcher_matches_direct_ops():
    np.testing.assert_array_equal(
        np.asarray(ops.get_quantizer("binary")(X)),
        np.asarray(ops.binary_connect_det(X)),
    )
    np.testing.assert_array_equal(
        np.asarray(ops.get_quantizer("dorefa_weight", bits=3)(X)),
        np.asarray(ops.dorefa_weight(X, bits=3)),
    )
    np.testing.assert_array_equal(
        np.asarray(ops.get_quantizer("xnor")(X)),
        np.asarray(ops.xnor_quantize(X) * ops.xnor_alpha(X)),
    )


def test_unknown_scheme_raises():
    with pytest.raises(ValueError, match="unknown scheme"):
        ops.get_quantizer("int3_magic")


def test_ste_flows_through_dispatcher():
    q = ops.get_quantizer("binary")
    g = jax.grad(lambda x: jnp.sum(q(x)))(X)
    # clipped STE: gradient 1 inside [-1, 1], 0 outside
    inside = np.abs(np.asarray(X)) <= 1.0
    np.testing.assert_array_equal(np.asarray(g), inside.astype(np.float32))
