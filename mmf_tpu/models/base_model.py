"""BaseModel: the contract every registered model implements.

Parity with mmf/models/base_model.py:66 re-founded on flax.linen: a model
is a pure module ``__call__(sample_list, train) -> {"scores": ...}``; the
trainer owns parameters, applies losses (``init_losses`` analog) inside the
jitted step, and handles checkpoint key mapping via ``format_state_key``.

Differences from the reference, by design:
  - no ``.to(device)`` / DataParallel plumbing — GSPMD shardings do this;
  - ``build()`` is replaced by linen ``setup()``/lazy init with the first
    batch (XLA needs concrete shapes anyway);
  - losses are pure functions applied by the trainer, not module state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from mmf_tpu.common.registry import registry
from mmf_tpu.modules.losses import Losses


class BaseModel(nn.Module):
    """Base class for all registered models.

    Subclasses set ``config`` (a ConfigNode of their model_config section)
    and implement ``__call__(sample_list, train=False)`` returning a dict
    containing at least ``scores``.
    """

    config: Any = None

    @classmethod
    def config_path(cls) -> Optional[str]:
        """Path to the model's default YAML (merged by Configuration)."""
        return None

    @classmethod
    def format_state_key(cls, key: str) -> str:
        """Map old/pretrained checkpoint keys to current names
        (reference base_model.py:170-192)."""
        return key

    @classmethod
    def from_params(cls, **kwargs):
        from mmf_tpu.config import omega

        return cls(config=omega.create(kwargs))

    def get_lr_multipliers(self, config=None):
        """Per-module LR scales as {param-path-prefix: scale} — the optax
        analog of the reference's per-module param groups
        (get_optimizer_parameters, e.g. m4c.py:306-328). None = uniform."""
        return None

    def get_weight_decay_mask(self, config=None):
        """Callable ``params -> bool pytree`` (True = decay) or None for
        uniform decay — the optax analog of the reference's weight-decay
        param grouping (get_optimizer_parameters_for_bert,
        mmf/utils/modeling.py:18-46: bias and LayerNorm params get
        weight_decay 0.0). BERT-family models return
        ``bert_no_decay_mask()``; None matches reference models without a
        custom get_optimizer_parameters (single group, uniform decay)."""
        return None

    def build_losses(self) -> Losses:
        """Construct the loss container from ``config.losses``
        (reference init_losses, base_model.py:123-135)."""
        loss_list = []
        if self.config is not None:
            loss_list = self.config.get("losses", []) or []
        if isinstance(loss_list, (dict,)) or (
            hasattr(loss_list, "keys") and not isinstance(loss_list, list)
        ):
            # dict-style losses (ViLT/mmft heads: {head_loss_key: loss_type})
            # are resolved inside the transformer heads, not by the trainer
            loss_list = []
        return Losses(loss_list)

    # linen __call__ to be implemented by subclasses
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        raise NotImplementedError


def build_model(config) -> BaseModel:
    """Instantiate the configured model (reference utils/build.py:116-151)."""
    model_name = config["model"]
    model_cls = registry.get_model_class(model_name)
    if model_cls is None:
        raise RuntimeError(
            f"No model registered for name: {model_name}. "
            f"Registered: {registry.list_models()}"
        )
    model_config = config["model_config"][model_name]
    return model_cls(config=model_config)
