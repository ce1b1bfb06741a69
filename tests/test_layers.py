"""Layer tests (reference L1 test matrix, SURVEY.md §4: shapes, manual
composition parity ``LinearX(x) == x @ quant(W) + b``, train-vs-eval,
elastic loss collection)."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_quantize_impls_tpu import nn, ops

KEY = jax.random.PRNGKey(0)
X = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
IMG = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))


def _kernel(params):
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        if "kernel" in jax.tree_util.keystr(path):
            return leaf
    raise KeyError("no kernel")


def test_linear_bin_matches_manual():
    layer = nn.LinearBin(features=8, use_bias=True)
    params = layer.init(KEY, X)
    y = layer.apply(params, X)
    w = _kernel(params)
    b = params["params"]["dense"]["bias"]
    np.testing.assert_allclose(
        y, X @ ops.binary_connect_det(w) + b, rtol=1e-5, atol=1e-5
    )


def test_linear_bin_stochastic_needs_rng_and_eval_deterministic():
    layer = nn.LinearBin(features=8, deterministic=False)
    params = layer.init({"params": KEY, "quant": KEY}, X)
    y1 = layer.apply(params, X, train=True, rngs={"quant": jax.random.PRNGKey(5)})
    y2 = layer.apply(params, X, train=True, rngs={"quant": jax.random.PRNGKey(6)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # eval mode: no rng needed; uses the clipped real-valued master weights
    # (BinaryConnect §2.4 test-time rule for stochastic: E[W_b] = w, so the
    # mean network IS the master — sign(w) would be a different net and
    # collapses accuracy, see test_train_e2e.test_stochastic_binary_mlp_learns)
    ye = layer.apply(params, X, train=False)
    w = _kernel(params)
    b = params["params"]["dense"]["bias"]
    np.testing.assert_allclose(ye, X @ jnp.clip(w, -1, 1) + b, rtol=1e-5)


def test_bin_conv_full_bnn_binarizes_input():
    layer = nn.BinConv(features=4, kernel_size=(3, 3), binarize_input=True)
    params = layer.init(KEY, IMG)
    y = layer.apply(params, IMG)
    assert y.shape == (2, 8, 8, 4)
    w = _kernel(params)
    ref = jax.lax.conv_general_dilated(
        ops.safe_sign(IMG),
        ops.safe_sign(w),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["params"]["conv"]["bias"]
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_xnor_linear_matches_manual():
    layer = nn.XNORLinear(features=8, use_bias=False)
    params = layer.init(KEY, X)
    y = layer.apply(params, X)
    w = _kernel(params)
    np.testing.assert_allclose(y, X @ ops.xnor_quantize(w), rtol=1e-5, atol=1e-5)


def test_xnor_conv_full_mode_shapes():
    layer = nn.XNORConv(features=4, binarize_input=True)
    params = layer.init(KEY, IMG)
    y = layer.apply(params, IMG)
    assert y.shape == (2, 8, 8, 4)


def test_xnor_layers_kernel_grad_can_flip_signs():
    """ADVICE r3 (high): the XNOR layers must carry the STE through the sign
    binarization, not only α's mean(|w|) path. α's per-element gradient is
    exactly along sign(w); if that were the only path, kernel signs could
    never flip and XNOR training dynamics break. Assert the kernel gradient
    has a nonzero component orthogonal to sign(w)."""
    for layer, x in [
        (nn.XNORLinear(features=8, use_bias=False), X),
        (nn.XNORConv(features=4, use_bias=False), IMG),
    ]:
        params = layer.init(KEY, x)

        def loss(p):
            y = layer.apply(p, x)
            # asymmetric target so the cotangent is not sign-aligned
            return jnp.sum(y * jnp.arange(y.size).reshape(y.shape))

        g = _kernel(jax.grad(loss)(params))
        w = _kernel(params)
        s = ops.safe_sign(w).ravel()
        gf = g.ravel()
        # remove the sign-parallel component (α path); remainder = STE path
        ortho = gf - (gf @ s) / (s @ s) * s
        assert float(jnp.linalg.norm(ortho)) > 1e-3, (
            "XNOR kernel gradient is purely along sign(w): STE path missing"
        )


def test_dorefa_linear_matches_manual_and_bitwight_alias():
    layer = nn.LinearDorefa(features=8, bits=4, use_bias=False)
    params = layer.init(KEY, X)
    y = layer.apply(params, X)
    w = _kernel(params)
    np.testing.assert_allclose(y, X @ ops.dorefa_weight(w, 4), rtol=1e-5, atol=1e-5)

    alias = nn.LinearDorefa(features=8, bitwight=2, use_bias=False)
    p2 = alias.init(KEY, X)
    y2 = alias.apply(p2, X)
    np.testing.assert_allclose(
        y2, X @ ops.dorefa_weight(_kernel(p2), 2), rtol=1e-5, atol=1e-5
    )


def test_dorefa_activation_quant_on_input():
    layer = nn.LinearDorefa(features=8, bits=4, a_bits=2, use_bias=False)
    params = layer.init(KEY, X)
    y = layer.apply(params, X)
    w = _kernel(params)
    xq = ops.dorefa_activation(X, 2)
    np.testing.assert_allclose(y, xq @ ops.dorefa_weight(w, 4), rtol=1e-5, atol=1e-5)


def test_log_lin_layers_match_manual():
    for cls, q in [
        (nn.LinearQuantLog, lambda w: ops.log_quant(w, fsr=1.0, bits=4)),
        (nn.LinearQuantLin, lambda w: ops.lin_quant(w, fsr=1.0, bits=4)),
    ]:
        layer = cls(features=8, fsr=1.0, bits=4, use_bias=False)
        params = layer.init(KEY, X)
        y = layer.apply(params, X)
        np.testing.assert_allclose(y, X @ q(_kernel(params)), rtol=1e-5, atol=1e-5)


def test_ternary_linear_support():
    layer = nn.LinearTer(features=8, use_bias=False)
    params = layer.init(KEY, X)
    w = _kernel(params)
    y = layer.apply(params, X)
    np.testing.assert_allclose(y, X @ ops.ternary_connect_det(w), rtol=1e-5, atol=1e-5)


def test_elastic_linear_sows_loss():
    layer = nn.ElasticLinear(features=8, grid="binary")
    params = layer.init(KEY, X)
    y, aux = layer.apply(params, X, mutable=["losses"])
    assert y.shape == (4, 8)
    loss = nn.collect_elastic_losses(aux)
    assert float(loss) > 0.0
    # loss is differentiable w.r.t. params
    def f(p):
        _, aux = layer.apply(p, X, mutable=["losses"])
        return nn.collect_elastic_losses(aux)

    g = jax.grad(f)(params)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()


def test_conv_quant_log_shapes():
    layer = nn.ConvQuantLog(features=4, fsr=1.0, bits=4)
    params = layer.init(KEY, IMG)
    assert layer.apply(params, IMG).shape == (2, 8, 8, 4)


def test_shift_norm_batch_train_eval():
    layer = nn.ShiftNormBatch()
    x = jax.random.normal(KEY, (16, 8)) * 3 + 1
    variables = layer.init(KEY, x)
    y, updated = layer.apply(variables, x, train=True, mutable=["batch_stats"])
    # normalized-ish: mean near 0 (scale is power-of-2 approx, so tolerance loose)
    assert abs(float(y.mean())) < 0.3
    # eval uses running stats without mutation
    ye = layer.apply(
        {"params": variables["params"], **updated}, x, train=False
    )
    assert ye.shape == x.shape


def test_gradients_flow_through_all_layers():
    for layer in [
        nn.LinearBin(features=8),
        nn.XNORLinear(features=8),
        nn.LinearDorefa(features=8, bits=4, a_bits=4),
        nn.LinearQuantLog(features=8, fsr=1.0, bits=4),
        nn.LinearQuantLin(features=8, fsr=1.0, bits=4),
        nn.LinearTer(features=8),
    ]:
        params = layer.init(KEY, X)
        g = jax.grad(lambda p: jnp.sum(layer.apply(p, X) ** 2))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves), layer


class TestActScale:
    """Learnable per-input-channel scale on binarized activations
    (``nn/binary.py::_input_binarizer``, the VERDICT r4 #3 magnitude-
    restoration lever for full-BNN nets)."""

    def test_param_created_and_default_identity(self):
        layer = nn.LinearBin(features=8, binarize_input=True, act_scale=True)
        params = layer.init(KEY, X)
        g = params["params"]["act_scale"]
        assert g.shape == (X.shape[-1],)
        np.testing.assert_array_equal(np.asarray(g), 1.0)
        # at the ones-init the layer IS plain full-BNN
        plain = nn.LinearBin(features=8, binarize_input=True)
        p2 = plain.init(KEY, X)
        np.testing.assert_allclose(
            np.asarray(layer.apply(params, X)),
            np.asarray(plain.apply(p2, X)),
            rtol=1e-6, atol=1e-6,
        )

    def test_gradient_flows_to_scale(self):
        layer = nn.LinearBin(features=8, binarize_input=True, act_scale=True)
        params = layer.init(KEY, X)

        def loss(p):
            return jnp.sum(layer.apply(p, X) ** 2)

        grads = jax.grad(loss)(params)
        g = grads["params"]["act_scale"]
        assert float(jnp.abs(g).sum()) > 0.0

    def test_scale_folds_into_kernel(self):
        """Deployment claim: per-input-channel g commutes into the kernel —
        ``(g * sign(x)) @ Wb == sign(x) @ (g[:, None] * Wb)`` — so packed
        export needs no new kernel, only a weight/epilogue transform."""
        layer = nn.BinConv(
            features=4, kernel_size=(3, 3), binarize_input=True,
            act_scale=True, use_bias=False,
        )
        params = layer.init(KEY, IMG)
        g = jax.random.uniform(
            jax.random.PRNGKey(3), (IMG.shape[-1],), minval=0.5, maxval=2.0
        )
        params = jax.tree_util.tree_map(lambda x: x, params)  # copy
        params["params"]["act_scale"] = g
        y = layer.apply(params, IMG)
        # fold: scale the binarized kernel's input-channel axis instead
        wq = ops.binary_connect_det(params["params"]["conv"]["kernel"])
        ib = ops.binary_tanh(IMG)
        ref = jax.lax.conv_general_dilated(
            ib, wq * g[None, None, :, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
