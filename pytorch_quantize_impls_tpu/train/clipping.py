"""Weight clipping as a sharded JAX transform.

Reference behavior (SURVEY.md §3.3): after every ``optimizer.step()`` the user
calls ``layer.clamp()`` to clip the fp32 master weights into the quantizer
domain (e.g. [-1, 1] — load-bearing for BinaryConnect accuracy, paper §2.3).

Here that imperative clamp becomes ``clip_quantized_weights``: an optax
``GradientTransformation`` appended to the optimizer chain that rewrites the
update so the *post-step parameter* lands inside the domain:
``u' = clip(p + u, -b, b) - p``. Because it is part of the optax chain it runs
under the same ``jit``/sharding as the rest of the step (BASELINE.json:5
"optimizer weight clipping becomes a sharded JAX transform").
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


PathFilter = Callable[[str], Optional[float]]


def default_clip_filter(bound: float = 1.0) -> PathFilter:
    """Clip every ``kernel`` leaf to ``[-bound, bound]``; leave biases, batch
    norm, and other params untouched (matches the reference's per-layer
    ``clamp()`` hitting only the quantized master weights)."""

    def f(path: str) -> Optional[float]:
        return bound if "kernel" in path else None

    return f


def _iter_with_bounds(tree, path_filter: PathFilter):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [(jax.tree_util.keystr(p), leaf) for p, leaf in flat]


def clip_quantized_weights(
    path_filter: Optional[PathFilter] = None,
) -> optax.GradientTransformation:
    """Optax transform implementing clamp-after-step (module docstring).

    ``path_filter`` maps a param path string (e.g. ``"['layer1']['dense']
    ['kernel']"``) to a clip bound, or ``None`` to skip. Defaults to clipping
    all kernels to [-1, 1].
    """
    pf = path_filter or default_clip_filter()

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("clip_quantized_weights requires params")

        def clip_update(path, u, p):
            bound = pf(jax.tree_util.keystr(path))
            if bound is None:
                return u
            return jnp.clip(p + u, -bound, bound) - p

        new_updates = jax.tree_util.tree_map_with_path(clip_update, updates, params)
        return new_updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_params(params, path_filter: Optional[PathFilter] = None):
    """One-shot functional clamp of a param tree (the reference's
    ``layer.clamp()`` applied directly, e.g. after loading a checkpoint)."""
    pf = path_filter or default_clip_filter()

    def clip_leaf(path, p):
        bound = pf(jax.tree_util.keystr(path))
        return p if bound is None else jnp.clip(p, -bound, bound)

    return jax.tree_util.tree_map_with_path(clip_leaf, params)
