"""BaseTransformer framework: backend + pluggable heads
(parity with mmf/models/transformers/base.py:57-411).

A transformer model = a BACKEND (embeddings + encoder over configured
modalities) + a dict of HEADS (mlm/itm/mlp/...) selected per dataset.
Heads are flax modules returning ``{"scores": ...}`` and/or
``{"losses": {...}}``; head losses merge into the model output and are
picked up by the jitted train step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel


class BaseTransformerHead(nn.Module):
    """Head contract (reference base.py:380-411)."""

    config: Any = None

    def get(self, key, default=None):
        return (self.config or {}).get(key, default)


class BaseTransformerBackend(nn.Module):
    """Backend contract (reference base.py:293-377): build embeddings per
    modality, build the joint attention mask, run the encoder."""

    config: Any = None

    def generate_embeddings(self, tokens_ids, position_ids, segment_ids,
                            attention_mask, deterministic=True):
        raise NotImplementedError

    def generate_attention_mask(self, masks):
        return jnp.concatenate(masks, axis=-1)

    def generate_encoded_layers(self, embedding, attention_mask,
                                deterministic=True):
        raise NotImplementedError


class HeadsDict:
    """Per-dataset head dispatch (reference heads/utils.py build_heads_dict).

    ``heads`` is {head_name: module_instance}; ``head_names`` is either a
    list (applies to all datasets) or {dataset: [head names]}; losses maps
    head name -> loss key."""

    def __init__(self, heads: Dict[str, Any], head_names, losses=None,
                 head_loss_names=None):
        self.heads = heads
        self.head_names = head_names
        # {loss_key: loss_type} from the model config (reference passes
        # MMFLoss instances; we instantiate the registered loss lazily).
        # List-style losses belong to the trainer's Losses container.
        if not hasattr(losses, "keys"):
            losses = {}
        self.losses = dict(losses or {})
        # {head_name: loss_key or None}
        self.head_loss_names = dict(head_loss_names or {})
        self._loss_fns: Dict[str, Any] = {}

    def names_for(self, dataset_name: str) -> List[str]:
        if isinstance(self.head_names, dict):
            return list(self.head_names.get(dataset_name, []))
        return list(self.head_names)

    def _loss_fn(self, loss_key: str):
        if loss_key not in self._loss_fns:
            from mmf_tpu.common.registry import registry

            loss_type = self.losses.get(loss_key)
            if loss_type is None:
                raise ValueError(
                    f"Head declares loss '{loss_key}' but model_config."
                    f"losses has no such key"
                )
            if isinstance(loss_type, dict):
                cls = registry.get_loss_class(loss_type["type"])
                self._loss_fns[loss_key] = cls(
                    **(loss_type.get("params", {}) or {})
                )
            else:
                self._loss_fns[loss_key] = registry.get_loss_class(
                    loss_type
                )()
        return self._loss_fns[loss_key]

    def __call__(self, dataset_name, sequence_output, sample_list,
                 deterministic=True):
        outputs: Dict[str, Any] = {"losses": {}}
        for name in self.names_for(dataset_name):
            head = self.heads[name]
            out = head(sequence_output, processed_sample_list=sample_list,
                       deterministic=deterministic)
            if not isinstance(out, dict):
                out = {"scores": out}
            if "losses" in out:
                outputs["losses"].update(out["losses"])
            else:
                # head returned raw scores: apply its declared loss
                # (reference heads/utils.py _process_head_output)
                loss_key = self.head_loss_names.get(name)
                if loss_key is not None and "targets" in sample_list:
                    outputs["losses"][loss_key] = self._loss_fn(loss_key)(
                        sample_list, {"scores": out["scores"]}
                    )
            for k, v in out.items():
                if k != "losses":
                    outputs[k] = v
        if not outputs["losses"]:
            outputs.pop("losses")
        return outputs


def build_head(head_config, name=None) -> nn.Module:
    head_type = head_config.get("type", "mlp")
    head_cls = registry.get_transformer_head_class(head_type)
    if head_cls is None:
        raise ValueError(f"No transformer head '{head_type}' registered")
    kwargs = {"name": name} if name is not None else {}
    return head_cls(config=dict(head_config), **kwargs)


def build_heads_dict(head_configs, tasks, losses=None) -> HeadsDict:
    """(reference heads/utils.py:24-120). head_configs is either a list of
    head configs (applied to all tasks) or {dataset: [head configs]}."""
    heads: Dict[str, Any] = {}
    head_loss_names: Dict[str, Any] = {}

    def register(hc, idx):
        name = hc.get("head_name", hc.get("type", f"head_{idx}"))
        if name in heads:
            name = f"{name}_{idx}"
        heads[name] = build_head(hc)
        head_loss_names[name] = hc.get("loss", None)
        return name

    if isinstance(head_configs, (list, tuple)):
        names = [register(hc, i) for i, hc in enumerate(head_configs)]
        return HeadsDict(heads, names, losses, head_loss_names)

    head_names: Dict[str, List[str]] = {}
    for dataset, hcs in (head_configs or {}).items():
        if isinstance(hcs, dict):
            hcs = [hcs]
        head_names[dataset] = [
            register(hc, i) for i, hc in enumerate(hcs)
        ]
    return HeadsDict(heads, head_names, losses, head_loss_names)


class BaseTransformer(BaseModel):
    """Model-side contract (reference base.py:57-290): build backend +
    heads, per-module LR multipliers via get_optimizer_parameters."""

    config: Any = None

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        base.py:107-164: set_lr_for_parameters builds groups through
        get_bert_configured_parameters)."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()

    def get_optimizer_parameters(self, config):
        return None  # lr multipliers handled via optax masks in trainer
