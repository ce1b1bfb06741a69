"""Native host codec (csrc/qtpu_pack.cpp): bit-exact parity with ops.pack,
and the device-free export path (infer.host_export) against the on-device
packer (infer.pack_model). New scope — the reference has no native code
(SURVEY.md §2 header); parity target is our own JAX codec."""

import subprocess
import sys
from pathlib import Path

import flax.linen as fnn
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_quantize_impls_tpu import infer, models, ops
from pytorch_quantize_impls_tpu.infer import host_export
from pytorch_quantize_impls_tpu.nn.base import QuantConv, QuantDense
from pytorch_quantize_impls_tpu.ops import pack as packlib
from pytorch_quantize_impls_tpu.utils import native

RNG = np.random.default_rng(7)


def test_native_builds_and_loads():
    assert native.available(), (
        "native codec should build on this image (g++ is baked in); "
        "see stderr for the compile error"
    )


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
@pytest.mark.parametrize("n", [1, 31, 128, 300])
def test_lane_pack_parity(bits, n):
    codes = RNG.integers(0, 2**bits, size=(5, n)).astype(np.int32)
    got = native.pack_lanes(codes, bits)
    want = np.asarray(packlib.pack(jnp.asarray(codes), bits))
    np.testing.assert_array_equal(got, want)
    back = native.unpack_lanes(got, bits, n)
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
@pytest.mark.parametrize("k", [32, 100, 1024, 1500])
def test_planar_pack_parity(bits, k):
    codes = RNG.integers(0, 2**bits, size=(k, 40)).astype(np.int32)
    got = native.pack_bitplanes(codes, bits)
    want = np.asarray(packlib.pack_bitplanes(jnp.asarray(codes), bits))
    np.testing.assert_array_equal(got, want)
    back = native.unpack_bitplanes(got, bits, k)
    np.testing.assert_array_equal(back, codes)


def test_planar_pack_batched():
    codes = RNG.integers(0, 4, size=(3, 70, 24)).astype(np.int32)
    got = native.pack_bitplanes(codes, 2)
    want = np.asarray(packlib.pack_bitplanes(jnp.asarray(codes), 2))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        native.unpack_bitplanes(got, 2, 70), codes
    )


def test_fused_binary_pack():
    w = RNG.normal(size=(200, 48)).astype(np.float32)
    w[0, 0] = 0.0  # safe_sign: 0 -> +1 -> code 1
    got = native.pack_binary_planar(w)
    want = np.asarray(packlib.pack_bitplanes((w >= 0).astype(np.int32), 1))
    np.testing.assert_array_equal(got, want)


def test_numpy_fallback_parity(monkeypatch):
    """With the .so unavailable the numpy fallbacks produce identical bytes."""
    codes = RNG.integers(0, 16, size=(150, 20)).astype(np.int32)
    w = RNG.normal(size=(150, 20)).astype(np.float32)
    with_lib = (
        native.pack_lanes(codes, 4),
        native.pack_bitplanes(codes, 4),
        native.pack_binary_planar(w),
    )
    monkeypatch.setattr(native, "_load", lambda: None)
    without = (
        native.pack_lanes(codes, 4),
        native.pack_bitplanes(codes, 4),
        native.pack_binary_planar(w),
    )
    for a, b in zip(with_lib, without):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        native.unpack_bitplanes(with_lib[1], 4, 150), codes
    )
    np.testing.assert_array_equal(
        native.unpack_lanes(with_lib[0], 4, 20), codes
    )


class _Zoo(fnn.Module):
    """One quantized layer of every packable scheme, for export parity."""

    @fnn.compact
    def __call__(self, x, train: bool = True):
        x = QuantDense(features=16, scheme="binary", w_bits=1, a_bits=1)(x)
        x = QuantDense(features=16, scheme="xnor", w_bits=1, a_bits=1)(x)
        x = QuantDense(features=16, scheme="dorefa", w_bits=4, a_bits=4)(x)
        x = QuantDense(features=16, scheme="dorefa", w_bits=1)(x)
        x = QuantDense(features=16, scheme="log", w_bits=4, fsr=1.0)(x)
        x = QuantDense(features=16, scheme="lin", w_bits=4, fsr=1.0)(x)
        x = QuantDense(features=16, scheme="ternary")(x)
        x = x.reshape(x.shape[0], 4, 4, 1)
        x = QuantConv(features=8, kernel_size=(3, 3), scheme="binary",
                      w_bits=1, a_bits=1)(x)
        x = QuantConv(features=8, kernel_size=(3, 3), scheme="xnor",
                      w_bits=1, a_bits=1)(x)
        return x.reshape(x.shape[0], -1)


def test_host_export_matches_device_pack():
    model = _Zoo()
    x = jnp.asarray(RNG.normal(size=(2, 16)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    dev = infer.pack_model(model, variables, x)
    host = host_export.host_pack_model(model, variables, x)
    assert set(dev) == set(host) and len(dev) == 9
    for path in dev:
        d, h = dev[path], host[path]
        assert (d.scheme, d.kind, d.w_bits, d.a_bits, d.fsr) == (
            h.scheme, h.kind, h.w_bits, h.a_bits, h.fsr
        )
        assert d.kernel_shape == h.kernel_shape
        np.testing.assert_array_equal(
            np.asarray(d.packed), np.asarray(h.packed), err_msg=str(path)
        )
        if d.alpha is not None:
            np.testing.assert_allclose(
                np.asarray(d.alpha), np.asarray(h.alpha), rtol=1e-6
            )


def test_host_export_artifact_round_trip(tmp_path):
    model = models.MLP(features=(32, 10), layer="bin")
    x = jnp.asarray(RNG.normal(size=(4, 16)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out = str(tmp_path / "m.packed.npz")
    n = host_export.export_packed(out, model, variables, x[:1])
    assert n > 0
    loaded = infer.load_packed(out)
    ref = model.apply(variables, x, train=False)
    got = infer.packed_apply(model, variables, loaded, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_export_cli(tmp_path):
    """End-to-end deployment path: checkpoint -> CLI -> loadable artifact."""
    import optax

    from pytorch_quantize_impls_tpu import train
    from pytorch_quantize_impls_tpu.utils import RunConfig, SCHEME_CONFIGS
    from pytorch_quantize_impls_tpu.utils.checkpoint import CheckpointManager
    from pytorch_quantize_impls_tpu.utils.config import build_model

    cfg = RunConfig(**SCHEME_CONFIGS["binaryconnect_digits"])
    model, input_shape, _ = build_model(cfg)
    sample = jnp.zeros((1, *input_shape), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, sample,
                           train=False)
    tx = optax.chain(optax.adam(cfg.lr), train.clip_quantized_weights())
    state = train.QuantTrainState.create_for(model, variables, tx)
    ckpt = tmp_path / "ckpt"
    mgr = CheckpointManager(str(ckpt), async_save=False)
    mgr.save(state, force=True)
    mgr.wait()
    mgr.close()

    out = tmp_path / "digits.packed.npz"
    repo = Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(repo / "scripts/export_packed.py"),
         "--config", "binaryconnect_digits", "--checkpoint-dir", str(ckpt),
         "--out", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    loaded = infer.load_packed(str(out))
    assert loaded
    ref = model.apply(variables, sample, train=False)
    got = infer.packed_apply(model, variables, loaded, sample)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
