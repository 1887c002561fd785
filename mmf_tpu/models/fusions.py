"""Fusion baseline models: concat_bert, concat_bow, late_fusion
(parity with mmf/models/fusions.py:57-194) — the hateful-memes baselines."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.encoders import build_image_encoder, build_text_encoder
from mmf_tpu.modules.layers import ClassifierLayer


class FusionBase(nn.Module):
    """Shared text+modal encoding (reference fusions.py:20-56)."""

    config: Any = None

    @nn.compact
    def __call__(self, text, modal, text_args=None, deterministic=True):
        text_encoder = build_text_encoder(
            self.config.get("text_encoder", {"type": "transformer",
                                             "params": {}})
        )
        # the modal encoder runs in BOTH modes: with direct_features_input
        # it is an ImageFeatureEncoder over precomputed features
        # (projection / fc7 / identity), not a raw-image trunk (reference
        # encoders.py:643-646 _build_modal_encoder)
        direct = self.config.get("direct_features_input", False)
        modal_cfg = dict(self.config.get(
            "modal_encoder",
            {"type": "default", "params": {}} if direct
            else {"type": "resnet152", "params": {}},
        ))
        modal_encoder = build_image_encoder(modal_cfg, direct_features=direct)
        if direct:
            modal_out = modal_encoder(modal)
        else:
            modal_out = modal_encoder(modal, not deterministic)

        text_args = text_args or []
        text_out = text_encoder(text, *text_args, deterministic=deterministic)
        if isinstance(text_out, (tuple, list)):
            text_out = text_out[1] if len(text_out) >= 2 else text_out[0]
        text_out = text_out.reshape(text_out.shape[0], -1)
        modal_out = modal_out.reshape(modal_out.shape[0], -1)
        return text_out, modal_out


def _classifier(config, x, deterministic, name="classifier"):
    cc = config["classifier"]
    params = dict(cc.get("params", {}))
    out_dim = params.pop("out_dim", config.get("num_labels", 2))
    params.pop("in_dim", None)
    return ClassifierLayer(
        cc["type"], 0, out_dim, params=params, name=name
    )(x, deterministic)


@registry.register_model("concat_bert")
class ConcatBERT(BaseModel):

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        mmf/models/fusions.py:87-95: get_optimizer_parameters_for_bert /
        get_bert_configured_parameters)."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/fusions/concat_bert.yaml"

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        text = sample_list["input_ids"]
        mask = sample_list["input_mask"]
        segment = sample_list["segment_ids"]
        modal = (
            sample_list["image_feature_0"]
            if self.config.get("direct_features_input", False)
            else sample_list["image"]
        )
        text_emb, modal_emb = FusionBase(self.config, name="base")(
            text, modal, [mask, segment], deterministic
        )
        embedding = jnp.concatenate([text_emb, modal_emb], axis=-1)
        return {"scores": _classifier(self.config, embedding, deterministic)}


@registry.register_model("concat_bow")
class ConcatBoW(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/fusions/concat_bow.yaml"

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        text = sample_list["text"]
        modal = (
            sample_list["image_feature_0"]
            if self.config.get("direct_features_input", False)
            else sample_list["image"]
        )
        text_emb, modal_emb = FusionBase(self.config, name="base")(
            text, modal, None, deterministic
        )
        embedding = jnp.concatenate([text_emb, modal_emb], axis=-1)
        return {"scores": _classifier(self.config, embedding, deterministic)}


@registry.register_model("late_fusion")
class LateFusion(BaseModel):
    """Separate per-modality classifiers, averaged
    (reference fusions.py:147-194)."""

    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/fusions/late_fusion.yaml"

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        text = sample_list["input_ids"]
        mask = sample_list["input_mask"]
        segment = sample_list["segment_ids"]
        modal = (
            sample_list["image_feature_0"]
            if self.config.get("direct_features_input", False)
            else sample_list["image"]
        )
        text_emb, modal_emb = FusionBase(self.config, name="base")(
            text, modal, [mask, segment], deterministic
        )
        # separate per-modality classifier CONFIGS (reference
        # fusions.py:163-175: modal_classifier / text_classifier), each
        # falling back to the shared `classifier` block
        cfg = dict(self.config)
        tc = cfg.get("text_classifier") or cfg.get("classifier")
        mc = cfg.get("modal_classifier") or cfg.get("classifier")
        text_scores = _classifier(
            dict(cfg, classifier=tc), text_emb, deterministic,
            name="text_classifier",
        )
        modal_scores = _classifier(
            dict(cfg, classifier=mc), modal_emb, deterministic,
            name="modal_classifier",
        )
        return {"scores": (text_scores + modal_scores) / 2}
