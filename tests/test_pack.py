"""Round-trip and layout tests for bit packing (SURVEY.md §7 step 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pytorch_quantize_impls_tpu.ops import pack


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
def test_roundtrip_exact(bits):
    key = jax.random.PRNGKey(bits)
    codes = jax.random.randint(key, (4, 130), 0, 2**bits)
    p = pack.pack(codes, bits)
    assert p.dtype == jnp.uint32
    assert p.shape == (4, pack.packed_size(130, bits))
    np.testing.assert_array_equal(pack.unpack(p, bits, 130), codes)


@given(
    bits=st.sampled_from([1, 2, 4, 8]),
    n=st.integers(min_value=1, max_value=200),
    seed=st.integers(min_value=0, max_value=2**16),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(bits, n, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 2**bits, size=(3, n))
    p = pack.pack(jnp.asarray(codes), bits)
    np.testing.assert_array_equal(pack.unpack(p, bits, n), codes)


def test_binary_encoding():
    w = jnp.array([1.0, -1.0, 1.0, 1.0, -1.0])
    p = pack.pack_binary(w)
    np.testing.assert_array_equal(pack.unpack_binary(p, 5), w)


def test_pack_layout_little_endian():
    codes = jnp.array([1, 0, 1, 1] + [0] * 28)
    p = pack.pack(codes, 1)
    assert int(p[0]) == 0b1101


def test_int_codes_roundtrip():
    v = jnp.array([-8, -1, 0, 7])
    c = pack.int_to_codes(v, 4)
    assert int(c.min()) >= 0 and int(c.max()) < 16
    np.testing.assert_array_equal(pack.codes_to_int(c, 4), v)


def test_dorefa_codes_roundtrip():
    from pytorch_quantize_impls_tpu import ops

    w = jax.random.normal(jax.random.PRNGKey(0), (64,))
    wq = ops.dorefa_weight(w, 4)
    c = pack.dorefa_weight_to_codes(wq, 4)
    np.testing.assert_allclose(pack.codes_to_dorefa_weight(c, 4), wq, atol=1e-6)


def test_log_codes_roundtrip():
    from pytorch_quantize_impls_tpu.ops.log_lin import log_quant_exponent

    x = jax.random.normal(jax.random.PRNGKey(1), (128,))
    s, idx = log_quant_exponent(x, fsr=1.0, bits=4)
    c = pack.log_to_codes(s.astype(jnp.int32), idx, 4)
    s2, idx2 = pack.codes_to_log(c, 4)
    np.testing.assert_array_equal(s2, s.astype(jnp.int32))
    np.testing.assert_array_equal(idx2, idx)


def test_padding_is_zero_codes():
    codes = jnp.ones((3,), jnp.int32)
    p = pack.pack(codes, 1)
    assert p.shape == (1,)
    assert int(p[0]) == 0b111
