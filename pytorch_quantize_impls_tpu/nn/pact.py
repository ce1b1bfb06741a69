"""PACT activation layer — learnable clip bound, k-bit activations.

Use in place of ReLU (it is one: clip(x, 0, α) plus quantization):

    x = nn.PACT(bits=4)(x, train=train)

The α L2 penalty (arXiv:1805.06085 §4) is sown into the 'losses' collection,
so ``train.make_train_step(elastic_weight=λ)`` picks it up alongside any
elastic penalties (``nn.collect_elastic_losses``).
"""

from __future__ import annotations

import flax.linen as fnn
import jax.numpy as jnp

from pytorch_quantize_impls_tpu import ops


class PACT(fnn.Module):
    bits: int = 4
    alpha_init: float = 6.0

    @fnn.compact
    def __call__(self, x, train: bool = True):
        alpha = self.param(
            "alpha", lambda key: jnp.asarray(self.alpha_init, jnp.float32)
        )
        self.sow("losses", "pact_alpha", ops.pact_alpha_penalty(alpha))
        return ops.pact(x, alpha, self.bits)
