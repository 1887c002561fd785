"""Optimizer construction on optax (parity with mmf/modules/optimizers.py +
mmf/utils/build.py:405-453).

Torch optimizers map to optax aliases; ``adam_w_skip_params_with_zero_grad``
(reference optimizers.py:20) becomes an optax wrapper that freezes moment
updates for leaves whose gradient is exactly zero this step. ZeRO-style
state sharding (fairscale OSS in the reference) is handled by GSPMD
sharding of the optimizer pytree in mmf_tpu/parallel, not here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from mmf_tpu.common.registry import registry

# torch-name -> optax alias
_TORCH_OPTIMIZERS = {
    "Adam": optax.adam,
    "adam": optax.adam,
    "AdamW": optax.adamw,
    "adam_w": optax.adamw,
    "adamw": optax.adamw,
    "SGD": optax.sgd,
    "sgd": optax.sgd,
    "Adamax": optax.adamax,
    "adamax": optax.adamax,
    "RMSprop": optax.rmsprop,
    "rmsprop": optax.rmsprop,
    "Adagrad": optax.adagrad,
    "adagrad": optax.adagrad,
    "LAMB": optax.lamb,
    "lamb": optax.lamb,
}

_PARAM_RENAMES = {
    # torch name -> optax name
    "lr": "learning_rate",
    "betas": "b1b2",
    "eps": "eps",
    "weight_decay": "weight_decay",
    "momentum": "momentum",
}


def _coerce_numeric(v):
    """YAML 1.1 parses '5e-05' (no dot) as a string; coerce such values."""
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return v
    if isinstance(v, (list, tuple)):
        return type(v)(_coerce_numeric(x) for x in v)
    return v


def _translate_params(opt_name: str, params: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    params = {k: _coerce_numeric(v) for k, v in params.items()}
    for k, v in params.items():
        if k == "lr":
            out["learning_rate"] = v
        elif k == "betas":
            out["b1"], out["b2"] = v[0], v[1]
        elif k == "weight_decay" and opt_name in ("adam", "Adam", "sgd", "SGD"):
            # optax.adam/sgd have no weight_decay arg; chain it below
            out["_weight_decay"] = v
        else:
            out[k] = v
    return out


@registry.register_optimizer("adam_w_skip_params_with_zero_grad")
def adam_w_skip_params_with_zero_grad(**params) -> optax.GradientTransformation:
    """AdamW that skips the update (incl. moment updates) for any leaf whose
    gradient is all-zero this step (reference optimizers.py:20-91)."""
    translated = _translate_params("adamw", dict(params))
    translated.pop("_weight_decay", None)
    inner = optax.adamw(**translated)

    def init_fn(params_):
        return inner.init(params_)

    def update_fn(grads, state, params_=None):
        updates, new_state = inner.update(grads, state, params_)

        nonzero = jax.tree_util.tree_map(
            lambda g: jnp.any(g != 0), grads
        )

        masked_updates = jax.tree_util.tree_map(
            lambda u, nz: jnp.where(nz, u, jnp.zeros_like(u)),
            updates, nonzero,
        )

        # freeze first/second moments for skipped leaves: optax.adamw's
        # state is a tuple whose adam component is a namedtuple carrying
        # params-shaped mu/nu pytrees — update those directly instead of
        # tree-mapping over mismatched structures
        def freeze_moments(new_comp, old_comp):
            if not (hasattr(new_comp, "mu") and hasattr(new_comp, "nu")):
                return new_comp
            mu = jax.tree_util.tree_map(
                lambda n, o, nz: jnp.where(nz, n, o),
                new_comp.mu, old_comp.mu, nonzero,
            )
            nu = jax.tree_util.tree_map(
                lambda n, o, nz: jnp.where(nz, n, o),
                new_comp.nu, old_comp.nu, nonzero,
            )
            return new_comp._replace(mu=mu, nu=nu)

        if isinstance(new_state, tuple):
            new_state = tuple(
                freeze_moments(n, o) for n, o in zip(new_state, state)
            )
        else:
            new_state = freeze_moments(new_state, state)
        return masked_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer_transform(
    config,
    schedule_fn=None,
    max_grad_norm: Optional[float] = None,
    lr_multipliers: Optional[Dict[str, float]] = None,
    weight_decay_mask=None,
) -> optax.GradientTransformation:
    """Build the full optax chain: clip -> optimizer -> lr schedule.

    Mirrors reference build_optimizer (utils/build.py:405-453): type from
    ``optimizer.type`` (torch name or registered custom), params from
    ``optimizer.params``.

    weight_decay_mask: callable ``params -> bool pytree`` (True = decay)
    from the model's ``get_weight_decay_mask`` — the reference's
    weight-decay param grouping (bias/LayerNorm exempt for BERT models,
    mmf/utils/modeling.py:18-46).
    """
    optimizer_config = config["optimizer"]
    if "type" not in optimizer_config:
        raise ValueError(
            "Optimizer attributes must have a 'type' key specifying the "
            "type of optimizer (e.g. 'adam_w')"
        )
    name = optimizer_config["type"]
    params = dict(optimizer_config.get("params", {}))

    custom = registry.get_optimizer_class(name)
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))

    if custom is not None:
        if weight_decay_mask is not None:
            params.setdefault("mask", weight_decay_mask)
        tx = custom(**params)
    elif name in _TORCH_OPTIMIZERS:
        if name.lower() in ("adam_w", "adamw") and "weight_decay" not in params:
            # torch.optim.AdamW defaults weight_decay to 0.01 (the
            # reference's effective default, utils/modeling.py:18);
            # optax's 1e-4 default would silently diverge
            params["weight_decay"] = 0.01
        translated = _translate_params(name, params)
        wd = translated.pop("_weight_decay", None)
        if wd:
            chain.append(
                optax.add_decayed_weights(wd, mask=weight_decay_mask)
            )
        if weight_decay_mask is not None and "weight_decay" in translated:
            translated["mask"] = weight_decay_mask
        tx = _TORCH_OPTIMIZERS[name](**translated)
    else:
        raise ValueError(
            f"No optimizer '{name}' in optax aliases or registry"
        )
    chain.append(tx)

    if schedule_fn is not None:
        chain.append(optax.scale_by_schedule(schedule_fn))

    if lr_multipliers:
        from mmf_tpu.utils.modeling import scale_updates_by_prefix

        chain.append(scale_updates_by_prefix(lr_multipliers))

    return optax.chain(*chain)
