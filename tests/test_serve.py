"""Continuous-batching engine tests: correctness of results under concurrent
load, batching behavior, deadline flush, mesh-sharded serving."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import infer, models, parallel
from pytorch_quantize_impls_tpu.serve import InferenceEngine

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def packed_mlp():
    model = models.MLP(features=(32, 10), layer="bin")
    x0 = jnp.zeros((1, 64))
    variables = model.init({"params": KEY}, x0, train=False)
    packed = infer.prepare(infer.pack_model(model, variables, x0))
    fwd = lambda x: infer.packed_apply(model, variables, packed, x)
    return model, variables, packed, fwd


def test_results_match_direct(packed_mlp):
    model, variables, packed, fwd = packed_mlp
    engine = InferenceEngine(fwd, (64,), batch_sizes=(1, 4, 16), max_delay_ms=5)
    try:
        xs = np.random.default_rng(0).normal(size=(40, 64)).astype(np.float32)
        futures = [engine.submit(x) for x in xs]
        got = np.stack([f.result(timeout=60) for f in futures])
        ref = np.asarray(fwd(jnp.asarray(xs)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
        assert engine.stats.requests == 40
        # continuous batching actually batched (fewer dispatches than requests)
        assert engine.stats.batches < 40
    finally:
        engine.shutdown()


def test_single_request_deadline_flush(packed_mlp):
    *_, fwd = packed_mlp
    engine = InferenceEngine(fwd, (64,), batch_sizes=(1, 4), max_delay_ms=1)
    try:
        engine.warmup()
        t0 = time.perf_counter()
        y = engine(np.zeros(64, np.float32))
        dt = time.perf_counter() - t0
        assert y.shape == (10,)
        assert dt < 5.0  # flushed by deadline, not stuck waiting for a batch
    finally:
        engine.shutdown()


def test_concurrent_clients(packed_mlp):
    *_, fwd = packed_mlp
    engine = InferenceEngine(fwd, (64,), batch_sizes=(1, 8, 32), max_delay_ms=3)
    results = {}

    def client(i):
        x = np.full((64,), i, np.float32) / 64
        results[i] = engine.submit(x).result(timeout=60)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(24)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert len(results) == 24
        # each client got ITS answer (inputs differ -> outputs differ)
        ref0 = np.asarray(fwd(jnp.full((1, 64), 0.0)))[0]
        np.testing.assert_allclose(results[0], ref0, rtol=1e-4, atol=1e-5)
    finally:
        engine.shutdown()


def test_error_propagates():
    def bad_forward(x):
        raise ValueError("boom")

    engine = InferenceEngine(bad_forward, (8,), batch_sizes=(1,), max_delay_ms=1)
    try:
        f = engine.submit(np.zeros(8, np.float32))
        with pytest.raises(Exception):
            f.result(timeout=30)
    finally:
        engine.shutdown()


def test_shape_validation(packed_mlp):
    *_, fwd = packed_mlp
    engine = InferenceEngine(fwd, (64,))
    try:
        with pytest.raises(ValueError):
            engine.submit(np.zeros(32, np.float32))
    finally:
        engine.shutdown()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_sharded_serving(packed_mlp):
    model, variables, packed, fwd = packed_mlp
    mesh = parallel.make_mesh((8, 1))
    engine = InferenceEngine(
        fwd, (64,), batch_sizes=(8, 32), max_delay_ms=3, mesh=mesh
    )
    try:
        xs = np.random.default_rng(1).normal(size=(32, 64)).astype(np.float32)
        futures = [engine.submit(x) for x in xs]
        got = np.stack([f.result(timeout=60) for f in futures])
        ref = np.asarray(fwd(jnp.asarray(xs)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
    finally:
        engine.shutdown()


def test_fused_chain_backend_matches_model():
    """VERDICT r4 #9: the engine executing a CNN FusedChain as its backend
    must serve the same logits the fake-quant model computes."""
    import zlib

    model = models.XNORConvNet(
        widths=(8, 8), binarize_inputs=True, use_input_scale_map=False
    )
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 1))
    v = model.init({"params": jax.random.PRNGKey(1)}, x0, train=False)

    def jitter(path, leaf):
        name = jax.tree_util.keystr(path)
        k = jax.random.fold_in(
            jax.random.PRNGKey(2), zlib.crc32(name.encode()) % (2**31)
        )
        if "batch_stats" in name and "var" in name:
            return jnp.abs(jax.random.normal(k, leaf.shape)) + 0.1
        if "batch_stats" in name and "mean" in name:
            return jax.random.normal(k, leaf.shape) * 0.3
        return leaf

    v = jax.tree_util.tree_map_with_path(jitter, v)
    chain = infer.export_fused_chain(model, v, first_dtype=jnp.float32)
    engine = InferenceEngine.from_fused_chain(
        chain, (8, 8, 1), batch_sizes=(1, 4), max_delay_ms=2
    )
    try:
        xs = np.random.default_rng(3).normal(size=(6, 8, 8, 1)).astype(
            np.float32
        )
        futures = [engine.submit(x) for x in xs]
        got = np.stack([f.result(timeout=60) for f in futures])
        ref = np.asarray(model.apply(v, jnp.asarray(xs), train=False))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        assert engine.stats.requests == 6
    finally:
        engine.shutdown()


def test_fused_resnet_backend_matches_model():
    model = models.DorefaResNet20(w_bits=4, a_bits=4, width=8)
    x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 3))
    v = model.init({"params": jax.random.PRNGKey(5)}, x0, train=False)
    net = infer.export_fused_resnet20(model, v, first_dtype=jnp.float32)
    engine = InferenceEngine.from_fused_resnet(
        net, (16, 16, 3), batch_sizes=(1, 4), max_delay_ms=2
    )
    try:
        xs = np.random.default_rng(6).normal(size=(5, 16, 16, 3)).astype(
            np.float32
        )
        futures = [engine.submit(x) for x in xs]
        got = np.stack([f.result(timeout=60) for f in futures])
        ref = np.asarray(model.apply(v, jnp.asarray(xs), train=False))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    finally:
        engine.shutdown()
