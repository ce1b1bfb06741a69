"""Quantized (int8/int4) ring all-reduce + compressed-DP train step, on the
8-virtual-device CPU mesh (SURVEY.md §4: fake-backend equivalent)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pytorch_quantize_impls_tpu import models, parallel, train
from pytorch_quantize_impls_tpu.parallel import quantized_collectives as qc


def _mesh(n=8, model=1):
    return parallel.make_mesh((n // model, model))


class TestCodec:
    def test_roundtrip_int8(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(513,)).astype(np.float32))
        codes, scale = qc.quantize_symmetric(x, 8)
        assert codes.dtype == jnp.int8
        err = jnp.max(jnp.abs(qc.dequantize_symmetric(codes, scale) - x))
        assert float(err) <= float(scale) * 0.5 + 1e-7

    def test_roundtrip_int4_pack(self):
        codes = jnp.asarray(
            np.random.default_rng(1).integers(-7, 8, size=64), jnp.int8
        )
        packed = qc._pack_int4(codes)
        assert packed.size == 32
        np.testing.assert_array_equal(np.asarray(qc._unpack_int4(packed)), codes)

    def test_zero_tensor(self):
        codes, scale = qc.quantize_symmetric(jnp.zeros((16,)), 8)
        out = qc.dequantize_symmetric(codes, scale)
        np.testing.assert_array_equal(np.asarray(out), 0.0)


class TestRingAllreduce:
    @pytest.mark.parametrize("bits", [8, 4])
    @pytest.mark.parametrize("n_elems", [1024, 1000, 7])
    def test_matches_psum(self, bits, n_elems):
        mesh = _mesh()
        n = 8
        rng = np.random.default_rng(2)
        xs = rng.normal(size=(n, n_elems)).astype(np.float32)

        @functools.partial(
            shard_map, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
            check_vma=False,
        )
        def f(x):
            return qc.ring_allreduce_quantized(x[0], "data", bits=bits)[None]

        got = np.asarray(jax.jit(f)(jnp.asarray(xs)))
        want = xs.sum(0)
        # every device row must hold the same (approximate) sum
        for d in range(n):
            np.testing.assert_allclose(got[d], got[0], rtol=0, atol=0)
        scale = np.abs(xs).sum(0).max() / (2 ** (bits - 1) - 1)
        tol = scale * n  # n-1 requant hops + final quantize
        np.testing.assert_allclose(got[0], want, atol=tol)

    def test_exact_on_single_device(self):
        mesh = parallel.make_mesh((1, 1), devices=jax.devices()[:1])
        x = jnp.arange(16.0)

        @functools.partial(
            shard_map, mesh=mesh, in_specs=P(), out_specs=P(),
            check_vma=False,
        )
        def f(x):
            return qc.ring_allreduce_quantized(x, "data", bits=8)

        np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))


class TestQuantizedDPStep:
    def _setup(self, mesh):
        # BN-free: under shard_map BatchNorm uses per-device batch stats,
        # which legitimately differs from GSPMD's global-batch stats.
        model = models.MLP(features=(32, 10), layer="bin", use_batchnorm=False)
        x = np.random.default_rng(0).normal(size=(16, 784)).astype(np.float32)
        y = (np.arange(16) % 10).astype(np.int32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x[:1]))
        tx = optax.chain(optax.adam(1e-3), train.clip_quantized_weights())
        state = train.QuantTrainState.create_for(model, variables, tx)
        return state, (x, y)

    def test_loss_decreases_and_matches_gspmd(self):
        mesh = _mesh()
        state, (x, y) = self._setup(mesh)
        state2, _ = self._setup(mesh)  # independent buffers: both steps donate
        qstate, qstep = qc.make_quantized_dp_train_step(state, mesh, bits=8)
        gstate, gstep = parallel.make_sharded_train_step(state2, mesh)
        batch = parallel.shard_batch((x, y), mesh)
        losses_q, losses_g = [], []
        for _ in range(5):
            qstate, qm = qstep(qstate, batch)
            gstate, gm = gstep(gstate, batch)
            losses_q.append(float(qm["loss"]))
            losses_g.append(float(gm["loss"]))
        assert losses_q[-1] < losses_q[0]
        # int8 grads track the exact path closely over a few steps
        np.testing.assert_allclose(losses_q, losses_g, rtol=0.05, atol=0.05)

    def test_rejects_tp_mesh(self):
        mesh = _mesh(model=2)
        state, _ = self._setup(mesh)
        with pytest.raises(ValueError, match="data-parallel only"):
            qc.make_quantized_dp_train_step(state, mesh)

    def test_comm_bytes_saved(self):
        tree = {"a": np.zeros((128, 128)), "b": np.zeros((128,))}
        r8 = qc.comm_bytes_saved(tree, 8)
        r4 = qc.comm_bytes_saved(tree, 4)
        assert 3.9 < r8["ratio"] < 4.0
        assert 7.5 < r4["ratio"] < 8.0
