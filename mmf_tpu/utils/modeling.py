"""Optimizer parameter grouping (parity with mmf/utils/modeling.py).

The reference builds torch param groups with per-module LRs
(get_optimizer_parameters_for_bert / M4C finetune_modules). Here the same
policy is an optax transform: a label pytree maps each param to a scale
group, and updates are multiplied accordingly — everything stays inside
the jitted step."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def lr_multiplier_labels(params: Any, prefix_scales: Dict[str, float]) -> Any:
    """Label each param leaf with the scale of the longest matching path
    prefix ('' -> 1.0). Scales are stored as f32 arrays so the transform
    state can flow through a jitted train step (string labels would fail
    abstraction at the jit boundary)."""

    def label_for(path):
        path_str = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        best, best_len = 1.0, -1
        for prefix, scale in prefix_scales.items():
            if path_str.startswith(prefix) and len(prefix) > best_len:
                best, best_len = float(scale), len(prefix)
        return jnp.asarray(best, jnp.float32)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: label_for(path), params
    )


def scale_updates_by_prefix(
    prefix_scales: Dict[str, float]
) -> optax.GradientTransformation:
    """optax transform scaling updates per param-path prefix."""

    def init_fn(params):
        return lr_multiplier_labels(params, prefix_scales)

    def update_fn(updates, state, params=None):
        scaled = jax.tree_util.tree_map(
            lambda u, s: u * s.astype(u.dtype), updates, state
        )
        return scaled, state

    return optax.GradientTransformation(init_fn, update_fn)


def get_bert_configured_parameters(params: Any, lr: Optional[float] = None,
                                   weight_decay: float = 0.01):
    """Weight-decay mask mirroring the reference's no-decay list
    (bias, LayerNorm) — returns an optax.masked-compatible mask pytree."""

    def decay_mask(path, _):
        path_str = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        ).lower()
        no_decay = ("bias" in path_str or "layer_norm" in path_str
                    or "layernorm" in path_str or "/scale" in path_str)
        return not no_decay

    return jax.tree_util.tree_map_with_path(decay_mask, params)


def bert_no_decay_mask(scopes=None):
    """Callable ``params -> bool mask pytree`` for optax's ``mask`` arg:
    True = apply weight decay. Mirrors the reference no-decay list
    ``["bias", "LayerNorm.bias", "LayerNorm.weight"]``
    (mmf/utils/modeling.py:26) — in flax terms: any ``bias`` leaf and
    LayerNorm ``scale``/``bias``.

    scopes: optional iterable of top-level param scopes the exemption
    applies to (reference models like ViLT bert-group only some
    submodules, vilt.py:187-195); params outside the scopes decay
    unconditionally, matching their plain torch param groups.
    """
    scope_set = tuple(scopes) if scopes is not None else None

    def decay_leaf(path, _):
        parts = [
            (p.key if hasattr(p, "key") else str(p)) for p in path
        ]
        if scope_set is not None and (
            not parts or parts[0] not in scope_set
        ):
            return True
        path_str = "/".join(parts).lower()
        no_decay = (
            path_str.endswith("bias")
            or path_str.endswith("scale")  # flax LayerNorm weight
            or "layer_norm" in path_str.rsplit("/", 1)[-1]
            or "layernorm" in path_str.rsplit("/", 1)[-1]
        )
        return not no_decay

    def mask_fn(params):
        return jax.tree_util.tree_map_with_path(decay_leaf, params)

    return mask_fn


def get_optimizer_parameters_for_bert(params, config):
    """Returns (weight_decay_mask, lr_multiplier_transform or None)
    (reference modeling.py:get_optimizer_parameters_for_bert)."""
    model_config = config.get("model_config", {}).get(
        config.get("model", ""), {}
    ) or {}
    finetune_mult = model_config.get("finetune_lr_multiplier", 1)
    mask = get_bert_configured_parameters(params)
    tx = None
    if finetune_mult != 1:
        # classifier/head params keep full lr; base gets the multiplier
        tx = scale_updates_by_prefix({
            "": float(finetune_mult),
            "classifier": 1.0,
            "heads": 1.0,
        })
    return mask, tx
