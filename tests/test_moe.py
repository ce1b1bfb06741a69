"""QuantMoE (nn/moe.py): switch routing exactness, capacity, aux loss, the
clamp-after-step contract, and expert-parallel (EP) sharding parity on the
8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import nn as qnn
from pytorch_quantize_impls_tpu import ops
from pytorch_quantize_impls_tpu.nn.moe import QuantMoE

E, D, F = 4, 16, 32


def _toy(t=24, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(t, D)).astype(np.float32))


def test_moe_matches_manual_routing():
    x = _toy()
    moe = QuantMoE(n_experts=E, d_ff=F, scheme="binary", capacity_factor=8.0)
    v = moe.init({"params": jax.random.PRNGKey(0)}, x)
    out, _ = moe.apply(v, x, mutable=["losses"])

    p = v["params"]
    logits = x @ p["router"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate = jnp.max(probs, axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    wi = ops.binary_connect_det(p["wi_kernel"])
    wo = ops.binary_connect_det(p["wo_kernel"])
    manual = []
    for t in range(x.shape[0]):
        e = int(idx[t])
        h = jax.nn.relu(x[t] @ wi[e])
        manual.append(float(gate[t]) * (h @ wo[e]))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.stack(manual)), rtol=1e-4, atol=1e-5
    )


def test_moe_capacity_drops_overflow():
    # capacity 1 slot/expert: at most E tokens can produce nonzero output
    x = _toy(t=32, seed=1)
    moe = QuantMoE(n_experts=E, d_ff=F, capacity_factor=1e-9)
    v = moe.init({"params": jax.random.PRNGKey(0)}, x)
    out, _ = moe.apply(v, x, mutable=["losses"])
    nonzero_rows = int(jnp.sum(jnp.any(out != 0, axis=-1)))
    assert nonzero_rows <= E, nonzero_rows


def test_moe_aux_loss_sown_and_scaled():
    x = _toy()
    moe = QuantMoE(n_experts=E, d_ff=F)
    v = moe.init({"params": jax.random.PRNGKey(0)}, x)
    _, aux = moe.apply(v, x, mutable=["losses"])
    loss = qnn.collect_elastic_losses(aux)
    # switch aux loss is >= 1 (perfect balance) and finite
    assert float(loss) >= 1.0 - 1e-3
    assert np.isfinite(float(loss))


def test_moe_expert_masters_are_clampable():
    from pytorch_quantize_impls_tpu.train.clipping import default_clip_filter

    f = default_clip_filter()
    assert f("['moe']['wi_kernel']") == 1.0
    assert f("['moe']['wo_kernel']") == 1.0
    assert f("['moe']['router']") is None


def test_moe_ep_sharding_parity():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_quantize_impls_tpu import parallel

    x = _toy(t=32, seed=2)
    moe = QuantMoE(n_experts=E, d_ff=F, capacity_factor=4.0)
    v = moe.init({"params": jax.random.PRNGKey(0)}, x)
    ref, _ = moe.apply(v, x, mutable=["losses"])

    mesh = parallel.make_mesh((2, 4))  # (data, model=expert)

    def spec(path, leaf):
        name = jax.tree_util.keystr(path)
        if "wi_kernel" in name or "wo_kernel" in name:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    vs = jax.tree_util.tree_map_with_path(spec, v)
    v_sharded = jax.device_put(v, vs)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(v, x):
        out, _ = moe.apply(v, x, mutable=["losses"])
        return out

    with mesh:
        got = fwd(v_sharded, x_sharded)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_moe_dorefa_scheme_and_grads():
    x = _toy()
    moe = QuantMoE(n_experts=E, d_ff=F, scheme="dorefa", w_bits=4)
    v = moe.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(params):
        out, _ = moe.apply({"params": params}, x, mutable=["losses"])
        return jnp.sum(out**2)

    g = jax.grad(loss)(v["params"])
    # STE: expert master grads flow and are finite
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert float(jnp.max(jnp.abs(g["wi_kernel"]))) > 0
