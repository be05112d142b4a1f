"""Partial-backbone fine-tuning: train the projection plus the last k
transformer layers, freezing everything else — the functional counterpart
of the reference's `enable_gradients(k_last_layers, enable_projection)`
(ref:bayesvlm/vlm.py:264-277,348-361,537-550).

With the scan-over-layers parameter layout ([L, ...] leading axis per
block leaf), "last k layers" is an elementwise mask on the leading axis:
gradients for layers < L-k are zeroed before the optimizer and the
corresponding parameter slices are restored after the update (so AdamW
weight decay cannot drift frozen slices). `remat=True` towers trade
recompute for activation memory during these passes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


def _is_block_path(path) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    return "layers" in keys and "block" in keys


def _is_projection_path(path, projection_names) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    return any(name in keys for name in projection_names)


def trainable_mask_fns(
    num_layers: int,
    k_last_layers: int,
    projection_names: Tuple[str, ...],
    enable_projection: bool = True,
):
    """Returns (mask_grads, restore_frozen):

    mask_grads(grads) zeroes gradients of frozen parameters — whole leaves
    for non-projection/non-block params, and the leading [0, L-k) slice of
    scan-stacked block leaves.
    restore_frozen(new_params, old_params) writes frozen values back."""
    cutoff = num_layers - k_last_layers

    def _layer_mask(leaf):
        L = leaf.shape[0]
        idx = jax.lax.broadcasted_iota(jnp.int32, (L,) + (1,) * (leaf.ndim - 1), 0)
        return idx >= cutoff

    def mask_grads(grads):
        def f(path, g):
            if _is_projection_path(path, projection_names):
                return g if enable_projection else jnp.zeros_like(g)
            if _is_block_path(path) and k_last_layers > 0:
                return jnp.where(_layer_mask(g), g, 0.0)
            return jnp.zeros_like(g)

        return jax.tree_util.tree_map_with_path(f, grads)

    def restore_frozen(new_params, old_params):
        def f(path, new, old):
            if _is_projection_path(path, projection_names):
                return new if enable_projection else old
            if _is_block_path(path) and k_last_layers > 0:
                return jnp.where(_layer_mask(new), new, old)
            return old

        return jax.tree_util.tree_map_with_path(f, new_params, old_params)

    return mask_grads, restore_frozen


def make_backbone_train_step(
    module,
    loss_fn: Callable[[Any, Dict], Array],
    num_layers: int,
    k_last_layers: int,
    projection_names: Tuple[str, ...],
    learning_rate: float = 1e-5,
    weight_decay: float = 5e-2,
    enable_projection: bool = True,
):
    """Build (init_state, jitted step). `loss_fn(params, batch)` returns a
    scalar; `batch` is any pytree of arrays."""
    opt = optax.adamw(learning_rate=learning_rate, weight_decay=weight_decay)

    def init_state(params):
        return opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        mask_grads, restore_frozen = trainable_mask_fns(
            num_layers, k_last_layers, projection_names, enable_projection,
        )
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = mask_grads(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = restore_frozen(new_params, params)
        return new_params, opt_state, loss

    return init_state, step
