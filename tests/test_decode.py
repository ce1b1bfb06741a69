"""Decode path: quantized KV cache (ops/kv_cache.py), cached attention
(models/transformer.py decode mode), and serve.generate. The contract is the
SURVEY.md §3.5 seam transplanted to sequence models: step-by-step decode must
reproduce the full-sequence forward — exactly with a raw cache, and within
int8 quantization tolerance with the default cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import ops, serve
from pytorch_quantize_impls_tpu.models.transformer import QuantTransformerLM

VOCAB = 32


def _model(**kw):
    kw.setdefault("vocab", VOCAB)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("max_len", 32)
    return QuantTransformerLM(**kw)


def _tokens(b=2, s=12, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, VOCAB, size=(b, s)).astype(np.int32))


# -- KV codec ---------------------------------------------------------------


def test_kv_roundtrip_accuracy():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 2, 64))
    codes, scale = ops.quantize_kv(x, bits=8)
    assert codes.dtype == jnp.int8 and scale.shape == (4, 16, 2)
    back = ops.dequantize_kv(codes, scale)
    # int8 symmetric: error bounded by scale/2 per element
    err = jnp.abs(back - x)
    bound = scale[..., None] / 2 + 1e-7
    assert bool(jnp.all(err <= bound))


def test_kv_zero_group_is_exact():
    x = jnp.zeros((3, 5))
    codes, scale = ops.quantize_kv(x)
    np.testing.assert_array_equal(np.asarray(ops.dequantize_kv(codes, scale)), 0.0)


def test_kv_bits_validation():
    with pytest.raises(ValueError):
        ops.quantize_kv(jnp.ones((2, 2)), bits=9)


# -- decode vs full forward ---------------------------------------------------


def _step_by_step(model, params, x):
    """Prefill on the first token, then single-token steps; stack logits."""
    md = model.clone(decode=True)
    outs = []
    logits, st = md.apply(
        {"params": params}, x[:, :1], train=False, mutable=["cache", "losses"]
    )
    outs.append(logits)
    cache = st["cache"]
    for t in range(1, x.shape[1]):
        logits, st = md.apply(
            {"params": params, "cache": cache},
            x[:, t : t + 1],
            train=False,
            mutable=["cache", "losses"],
        )
        outs.append(logits)
        cache = st["cache"]
    return jnp.concatenate(outs, axis=1)


def test_decode_matches_forward_raw_cache():
    """kv_bits=None: cached decode is numerically the same computation."""
    m = _model(kv_bits=None)
    x = _tokens()
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = m.apply(v, x, train=False)
    got = _step_by_step(m, v["params"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_decode_matches_forward_int8_cache():
    """Default int8 KV cache: small relative perturbation of the logits
    (untrained binary nets have extreme activation ranges, so elementwise
    closeness is the wrong bar); greedy tokens identical."""
    m = _model()
    x = _tokens()
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = m.apply(v, x, train=False)
    got = _step_by_step(m, v["params"], x)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(got, -1)), np.asarray(jnp.argmax(ref, -1))
    )


def test_prefill_then_steps_matches_all_steps():
    """Block prefill (whole prompt at once) == token-by-token prefill."""
    m = _model(kv_bits=None)
    x = _tokens(s=10)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    md = m.clone(decode=True)
    last, cache = serve.prefill(md, v["params"], x[:, :7])
    step_logits = _step_by_step(m, v["params"], x)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(step_logits[:, 6]), atol=1e-4, rtol=1e-4
    )
    # continue decoding from the block-prefilled cache
    logits, _ = md.apply(
        {"params": v["params"], "cache": cache},
        x[:, 7:8],
        train=False,
        mutable=["cache", "losses"],
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, 0]), np.asarray(step_logits[:, 7]), atol=1e-4, rtol=1e-4
    )


# -- generate -----------------------------------------------------------------


def test_generate_greedy_matches_manual_loop():
    m = _model(kv_bits=None)
    x = _tokens(b=2, s=6)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    toks = serve.generate(m, v["params"], x, 5)
    assert toks.shape == (2, 5) and toks.dtype == jnp.int32

    # manual greedy rollout via full forwards (no cache at all)
    cur = x
    expect = []
    for _ in range(5):
        logits = m.apply(v, cur, train=False)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        expect.append(nxt)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(
        np.asarray(toks), np.asarray(jnp.stack(expect, axis=1))
    )


def test_generate_sampling_deterministic_under_key():
    m = _model()
    x = _tokens(b=2, s=4)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    k = jax.random.PRNGKey(7)
    a = serve.generate(m, v["params"], x, 6, key=k, temperature=1.0)
    b = serve.generate(m, v["params"], x, 6, key=k, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = serve.generate(
        m, v["params"], x, 6, key=jax.random.PRNGKey(8), temperature=1.0
    )
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_generate_moe_model():
    """Decode works through the MoE FFN (EP-style experts, aux loss sown)."""
    m = _model(n_experts=2, n_layers=1, capacity_factor=4.0)
    x = _tokens(b=2, s=4)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    toks = serve.generate(m, v["params"], x, 4)
    assert toks.shape == (2, 4)
