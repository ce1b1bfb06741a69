"""Continuous-batching decode engine (serve/decode_engine.py): slot-batched
generation must reproduce single-request ``serve.generate`` greedily, survive
slot reuse (more requests than slots, stale-cache overwrite), honor eos, and
reject oversized requests."""

import numpy as np
import pytest

import jax

from pytorch_quantize_impls_tpu import serve
from pytorch_quantize_impls_tpu.models.transformer import QuantTransformerLM

VOCAB = 32


@pytest.fixture(scope="module")
def model_and_params():
    m = QuantTransformerLM(
        vocab=VOCAB, d_model=32, n_heads=2, n_layers=2, d_ff=64, max_len=32
    )
    x = np.zeros((1, 4), np.int32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return m, v["params"]


def _prompts(seed=0, n=5, lens=(3, 7, 5, 9, 4)):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, VOCAB, size=(l,)).astype(np.int32) for l in lens[:n]]


def _expected(m, params, prompt, n_new):
    out = serve.generate(m, params, prompt[None], n_new)
    return np.asarray(out[0])


def test_engine_matches_generate_mixed_lengths(model_and_params):
    m, params = model_and_params
    eng = serve.DecodeEngine(m, params, n_slots=4)
    try:
        prompts = _prompts()
        futs = [eng.submit(p, max_new=6) for p in prompts]
        got = [f.result(timeout=120) for f in futs]
    finally:
        eng.shutdown()
    for p, g in zip(prompts, got):
        np.testing.assert_array_equal(g, _expected(m, params, p, 6))
    assert eng.stats.requests == len(prompts)
    assert eng.stats.tokens == 6 * len(prompts)
    assert 0 < eng.stats.mean_occupancy <= 1


def test_slot_reuse_more_requests_than_slots(model_and_params):
    """2 slots, 5 requests: retired slots are reused; stale cache rows from
    the previous occupant must not leak into the next one's outputs."""
    m, params = model_and_params
    eng = serve.DecodeEngine(m, params, n_slots=2)
    try:
        prompts = _prompts(seed=3, lens=(9, 3, 6, 11, 5))
        futs = [eng.submit(p, max_new=5) for p in prompts]
        got = [f.result(timeout=180) for f in futs]
    finally:
        eng.shutdown()
    for p, g in zip(prompts, got):
        np.testing.assert_array_equal(g, _expected(m, params, p, 5))


def test_eos_early_stop(model_and_params):
    m, params = model_and_params
    p = _prompts()[0]
    full = _expected(m, params, p, 6)
    eos = int(full[0])  # greedy determinism: rerun stops immediately
    eng = serve.DecodeEngine(m, params, n_slots=2)
    try:
        got = eng(p, max_new=6, eos=eos)
    finally:
        eng.shutdown()
    np.testing.assert_array_equal(got, full[:1])


@pytest.mark.parametrize(
    "scheme,w_bits,a_bits",
    [("binary", 1, 0), ("dorefa", 4, 0), ("dorefa", 4, 4)],
)
def test_packed_engine_matches_fake_quant(scheme, w_bits, a_bits):
    """Serving with packed weights (infer.pack_model records intercepted in
    the decode twin) must produce the same greedy tokens as the fake-quant
    path — the SURVEY §3.5 train/infer seam, applied to decode."""
    from pytorch_quantize_impls_tpu import infer

    m = QuantTransformerLM(
        vocab=VOCAB, d_model=32, n_heads=2, n_layers=2, d_ff=64, max_len=32,
        scheme=scheme, w_bits=w_bits, a_bits=a_bits,
    )
    x = np.zeros((1, 4), np.int32)
    v = m.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    params = v["params"]
    packed = infer.pack_model(m, v, jax.numpy.asarray(x))
    assert len(packed) == 2 * 4 + 2 * 2  # 4 attn + 2 ffn projections / layer

    prompts = _prompts(seed=5, lens=(4, 8, 6))
    ref_eng = serve.DecodeEngine(m, params, n_slots=2)
    try:
        ref = [ref_eng(p, max_new=4) for p in prompts]
    finally:
        ref_eng.shutdown()
    pk_eng = serve.DecodeEngine(m, params, packed=packed, n_slots=2)
    try:
        got = [pk_eng(p, max_new=4) for p in prompts]
    finally:
        pk_eng.shutdown()
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "use_packed,mesh_shape",
    [
        (False, (4, 2)),  # DP over slots, fake-quant
        (True, (4, 2)),   # DP over slots, packed (replicated weights)
        (True, (2, 4)),   # DP x TP: packed codes COLUMN-SHARDED over model
    ],
)
def test_mesh_sharded_engine_matches_generate(use_packed, mesh_shape):
    """Multi-device serving (VERDICT r2 #3): engine stepping on a (data,
    model) mesh — slots sharded over the data axis via shard_map, and with
    a model axis the packed low-bit weights tensor-sharded column-wise —
    must reproduce single-request ``generate`` exactly (greedy)."""
    from pytorch_quantize_impls_tpu import infer, parallel

    m = QuantTransformerLM(
        vocab=VOCAB, d_model=32, n_heads=2, n_layers=2, d_ff=64, max_len=32,
        scheme="binary", w_bits=1, a_bits=1,
    )
    x = np.zeros((1, 4), np.int32)
    v = m.init({"params": jax.random.PRNGKey(2)}, x, train=False)
    params = v["params"]
    packed = infer.pack_model(m, v, jax.numpy.asarray(x)) if use_packed else None

    mesh = parallel.make_mesh(mesh_shape)
    eng = serve.DecodeEngine(
        m, params, packed=packed, n_slots=8, mesh=mesh
    )
    try:
        prompts = _prompts(seed=7, lens=(3, 7, 5, 9, 4, 6))
        futs = [eng.submit(p, max_new=5) for p in prompts]
        got = [f.result(timeout=300) for f in futs]
    finally:
        eng.shutdown()
    for p, g in zip(prompts, got):
        np.testing.assert_array_equal(g, _expected(m, params, p, 5))

    if mesh_shape[0] == 4:
        with pytest.raises(ValueError):  # 6 slots don't divide the 4-way axis
            serve.DecodeEngine(m, params, n_slots=6, mesh=mesh)


def test_long_prompt_beyond_buckets(model_and_params):
    """A prompt longer than every configured bucket but within max_len is
    served via the power-of-two fallback bucket (ADVICE r2) and still
    matches ``generate``."""
    m, params = model_and_params
    eng = serve.DecodeEngine(m, params, n_slots=2, prompt_buckets=(4, 8))
    try:
        p = _prompts(seed=11, lens=(27,), n=1)[0]  # 27 > 8, <= 32
        got = eng(p, max_new=3)
    finally:
        eng.shutdown()
    np.testing.assert_array_equal(got, _expected(m, params, p, 3))


def test_submit_validation(model_and_params):
    m, params = model_and_params
    eng = serve.DecodeEngine(m, params, n_slots=2)
    try:
        with pytest.raises(ValueError):
            eng.submit(np.zeros((2, 2), np.int32), max_new=2)
        with pytest.raises(ValueError):
            eng.submit(np.zeros((30,), np.int32), max_new=10)  # 40 > 32
    finally:
        eng.shutdown()
