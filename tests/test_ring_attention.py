"""Ring attention (parallel/ring_attention.py): context-parallel (CP)
blockwise attention over a sequence-sharded ring must match full softmax
attention — forward AND gradients — on the 8-virtual-device mesh
(SURVEY.md §4 implication 2b: fake-backend = CPU host-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import parallel
from pytorch_quantize_impls_tpu.parallel.ring_attention import full_attention


def _qkv(b=2, s=32, h=2, d=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda i: jnp.asarray(
        rng.normal(size=(b, s, h, d)).astype(np.float32), dtype=dtype
    )
    return mk(0), mk(1), mk(2)


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return parallel.make_mesh((2, 4))  # (data, model->sequence ring)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(causal):
    mesh = _mesh()
    q, k, v = _qkv()
    ref = full_attention(q, k, v, causal=causal)
    ring = parallel.make_ring_attention(mesh, causal=causal)
    with mesh:
        got = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_gradients_match():
    """ppermute is differentiable; STE-free path, grads must agree."""
    mesh = _mesh()
    q, k, v = _qkv(s=16)
    ring = parallel.make_ring_attention(mesh, causal=True)

    def loss_ref(q, k, v):
        return jnp.sum(full_attention(q, k, v, causal=True) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_ring_rejects_indivisible_sequence():
    mesh = _mesh()
    q, k, v = _qkv(s=30)
    ring = parallel.make_ring_attention(mesh)
    with pytest.raises(ValueError, match="not divisible"):
        with mesh:
            ring(q, k, v)


def test_transformer_cp_parity():
    """QuantTransformerLM with injected ring attention_fn: logits under
    (data, sequence-ring) sharding must match the replicated default-
    attention run — CP completes the DP/TP/PP/SP/EP parallel surface."""
    mesh = _mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_quantize_impls_tpu.models.transformer import QuantTransformerLM

    kw = dict(
        vocab=32, d_model=32, n_heads=2, n_layers=2, d_ff=64, max_len=32,
        scheme="binary",
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 32, size=(4, 16)).astype(np.int32))

    m_ref = QuantTransformerLM(**kw)
    v = m_ref.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = m_ref.apply(v, x, train=False)

    ring = parallel.make_ring_attention(mesh, causal=True)
    m_cp = QuantTransformerLM(**kw, attention_fn=ring)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    vr = jax.device_put(v, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(v, x):
        return m_cp.apply(v, x, train=False)

    with mesh:
        got = fwd(vr, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
