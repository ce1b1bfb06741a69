"""Parity tests for the fused serving decode path (VERDICT r4 #4/#9).

Contract (SURVEY.md §3.5 seam rule): the fused program — single-GEMM QKV,
one-pass int8-cache attention kernel, threshold-folded FFN boundary — must
match the fake-quant decode model. The integer GEMMs are exact; the
attention kernel and LayerNorms differ only in f32 expression order, so
logits agree to fp tolerance and greedy tokens agree exactly (up to
measure-zero sign boundaries, which the random-weight fixtures avoid).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_quantize_impls_tpu import infer, serve
from pytorch_quantize_impls_tpu.models.transformer import QuantTransformerLM
from pytorch_quantize_impls_tpu.serve.generate import _MUT


def _small_lm(**kw):
    cfg = dict(
        vocab=128, d_model=64, n_heads=4, n_layers=2, d_ff=128,
        max_len=64, scheme="binary", w_bits=1, a_bits=1,
    )
    cfg.update(kw)
    return QuantTransformerLM(**cfg)


@pytest.fixture(scope="module")
def lm_and_vars():
    lm = _small_lm()
    toks = jnp.zeros((1, 4), jnp.int32)
    v = lm.init({"params": jax.random.PRNGKey(0)}, toks, train=False)
    return lm, v


def test_fused_decode_prefill_and_steps_match(lm_and_vars):
    lm, v = lm_and_vars
    md = lm.clone(decode=True)
    fm = infer.export_fused_decode(lm, v)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, lm.vocab, (3, 8)), jnp.int32)

    ref, st = md.apply({"params": v["params"]}, toks, train=False, mutable=_MUT)
    got, fst = infer.fused_decode_apply(fm, None, toks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

    cache_f, cache_g = st["cache"], fst["cache"]
    t = jnp.argmax(ref[:, -1], -1).astype(jnp.int32)
    for _ in range(6):
        rl, st = md.apply(
            {"params": v["params"], "cache": cache_f}, t[:, None],
            train=False, mutable=_MUT,
        )
        gl, fst = infer.fused_decode_apply(fm, cache_g, t[:, None])
        cache_f, cache_g = st["cache"], fst["cache"]
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(rl), rtol=2e-4, atol=2e-4
        )
        tr = jnp.argmax(rl[:, 0], -1).astype(jnp.int32)
        tg = jnp.argmax(gl[:, 0], -1).astype(jnp.int32)
        assert bool((tr == tg).all())
        t = tr


def test_fused_decode_requires_binary_w1a1():
    lm = _small_lm(scheme="dorefa", w_bits=4, a_bits=4)
    toks = jnp.zeros((1, 4), jnp.int32)
    v = lm.init({"params": jax.random.PRNGKey(0)}, toks, train=False)
    with pytest.raises(ValueError, match="binary W1A1"):
        infer.export_fused_decode(lm, v)


def test_ffn_sign_activation_not_degenerate(lm_and_vars):
    """r5 regression: binary_tanh(relu(x)) was constant +1 (relu >= 0 and
    sign(0) = +1), so the 1-bit FFN second matmul saw a constant input.
    With the sign-as-nonlinearity fix, ffn_out's input codes must vary."""
    lm, v = lm_and_vars
    captured = {}
    import flax.linen as fnn
    from pytorch_quantize_impls_tpu.nn.base import QuantDense

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if isinstance(m, QuantDense) and m.path and m.path[-1] == "ffn_out":
            captured["codes"] = jnp.where(args[0] >= 0, 1, -1)
        return next_fun(*args, **kwargs)

    toks = jnp.asarray(
        np.random.default_rng(2).integers(0, lm.vocab, (2, 8)), jnp.int32
    )
    with fnn.intercept_methods(interceptor):
        lm.apply(v, toks, train=False)
    codes = np.asarray(captured["codes"])
    assert codes.min() == -1 and codes.max() == 1


def test_engine_fused_backend_matches_generate(lm_and_vars):
    """The engine running the fused backend must produce the same greedy
    tokens as the plain fake-quant engine (slot machinery unchanged)."""
    lm, v = lm_and_vars
    fm = infer.export_fused_decode(lm, v)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, lm.vocab, (n,)) for n in (5, 9, 12)]

    eng_ref = serve.DecodeEngine(lm, v["params"], n_slots=4)
    ref = [np.asarray(eng_ref(p, max_new=6)) for p in prompts]
    eng_ref.shutdown()

    eng = serve.DecodeEngine(lm, v["params"], fused=fm, n_slots=4)
    got = [np.asarray(eng(p, max_new=6)) for p in prompts]
    eng.shutdown()

    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_engine_fused_rejects_packed_combo(lm_and_vars):
    lm, v = lm_and_vars
    fm = infer.export_fused_decode(lm, v)
    with pytest.raises(ValueError, match="exclusive"):
        serve.DecodeEngine(lm, v["params"], fused=fm, packed={})


def test_fused_decode_packed_weights_exact(lm_and_vars):
    """The 1-bit-resident (planar packed, Pallas binary_gemm) weight option
    must be bit-exact with the int8-resident export — both are exact
    integer GEMMs over the same ±1 codes."""
    lm, v = lm_and_vars
    fi = infer.export_fused_decode(lm, v, weights="int8")
    fp = infer.export_fused_decode(lm, v, weights="packed")
    toks = jnp.asarray(
        np.random.default_rng(4).integers(0, lm.vocab, (2, 8)), jnp.int32
    )
    li, ci = infer.fused_decode_apply(fi, None, toks)
    lp, cp = infer.fused_decode_apply(fp, None, toks)
    np.testing.assert_array_equal(np.asarray(li), np.asarray(lp))
    t = jnp.argmax(li[:, -1], -1).astype(jnp.int32)
    li2, _ = infer.fused_decode_apply(fi, ci["cache"], t[:, None])
    lp2, _ = infer.fused_decode_apply(fp, cp["cache"], t[:, None])
    np.testing.assert_array_equal(np.asarray(li2), np.asarray(lp2))
