"""Ulysses attention (parallel/ulysses.py): all-to-all head<->sequence
resharding must match full softmax attention — forward AND gradients — on
the 8-virtual-device mesh, and agree with ring attention (the two CP/SP
strategies are interchangeable implementations of the same math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import parallel
from pytorch_quantize_impls_tpu.parallel.ring_attention import full_attention


def _qkv(b=2, s=32, h=4, d=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    return mk(), mk(), mk()


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return parallel.make_mesh((2, 4))  # (data, model->sequence)


@pytest.mark.parametrize("causal", [True, False])
def test_ulysses_matches_full(causal):
    mesh = _mesh()
    q, k, v = _qkv()
    ref = full_attention(q, k, v, causal=causal)
    uly = parallel.make_ulysses_attention(mesh, causal=causal)
    with mesh:
        got = jax.jit(uly)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ulysses_matches_ring():
    mesh = _mesh()
    q, k, v = _qkv(seed=1)
    uly = parallel.make_ulysses_attention(mesh, causal=True)
    ring = parallel.make_ring_attention(mesh, causal=True)
    with mesh:
        a = jax.jit(uly)(q, k, v)
        b = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_ulysses_gradients_match():
    """all_to_all is differentiable; grads must agree with the local twin."""
    mesh = _mesh()
    q, k, v = _qkv(s=16)
    uly = parallel.make_ulysses_attention(mesh, causal=True)

    def loss_ref(q, k, v):
        return jnp.sum(full_attention(q, k, v, causal=True) ** 2)

    def loss_uly(q, k, v):
        return jnp.sum(uly(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with mesh:
        g_uly = jax.jit(jax.grad(loss_uly, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_uly, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_ulysses_rejects_bad_shapes():
    mesh = _mesh()
    uly = parallel.make_ulysses_attention(mesh)
    q, k, v = _qkv(s=30)
    with pytest.raises(ValueError, match="not divisible"):
        with mesh:
            uly(q, k, v)
    q, k, v = _qkv(h=2)  # 2 heads < SP degree 4
    with pytest.raises(ValueError, match="n_heads"):
        with mesh:
            uly(q, k, v)


def test_transformer_ulysses_parity():
    """QuantTransformerLM with injected Ulysses attention_fn matches the
    replicated default-attention run."""
    mesh = _mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_quantize_impls_tpu.models.transformer import QuantTransformerLM

    kw = dict(
        vocab=32, d_model=32, n_heads=4, n_layers=2, d_ff=64, max_len=32,
        scheme="binary",
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 32, size=(4, 16)).astype(np.int32))

    m_ref = QuantTransformerLM(**kw)
    v = m_ref.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = m_ref.apply(v, x, train=False)

    uly = parallel.make_ulysses_attention(mesh, causal=True)
    m_sp = QuantTransformerLM(**kw, attention_fn=uly)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    vr = jax.device_put(v, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(v, x):
        return m_sp.apply(v, x, train=False)

    with mesh:
        got = fwd(vr, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
