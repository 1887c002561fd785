"""Unimodal baselines: unimodal_text, unimodal_image
(parity with mmf/models/unimodal.py)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.models.fusions import _classifier
from mmf_tpu.modules.encoders import build_image_encoder, build_text_encoder


@registry.register_model("unimodal_text")
class UnimodalText(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/unimodal/text.yaml"

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        encoder = build_text_encoder(
            self.config.get("text_encoder", {"type": "transformer",
                                             "params": {}})
        )
        args = []
        if "input_ids" in sample_list:
            text = sample_list["input_ids"]
            args = [sample_list["input_mask"], sample_list["segment_ids"]]
        else:
            text = sample_list["text"]
        emb = encoder(text, *args, deterministic=deterministic)
        if isinstance(emb, (tuple, list)):
            emb = emb[1] if len(emb) >= 2 else emb[0]
        emb = emb.reshape(emb.shape[0], -1)
        return {"scores": _classifier(self.config, emb, deterministic)}


@registry.register_model("unimodal_image")
class UnimodalModal(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/unimodal/image.yaml"

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        direct = self.config.get("direct_features_input", False)
        if direct:
            # regions are mean-pooled BEFORE the feature encoder
            # (reference unimodal.py:100-102), which still runs — it is an
            # ImageFeatureEncoder (identity/projection/fc7) in this mode
            modal = jnp.mean(sample_list["image_feature_0"], axis=1)
            encoder = build_image_encoder(
                dict(self.config.get(
                    "modal_encoder", {"type": "default", "params": {}}
                )),
                direct_features=True,
            )
            modal = encoder(modal)
        else:
            encoder = build_image_encoder(
                self.config.get("modal_encoder", {"type": "resnet152",
                                                  "params": {}})
            )
            modal = encoder(sample_list["image"], not deterministic)
        modal = modal.reshape(modal.shape[0], -1)
        return {"scores": _classifier(self.config, modal, deterministic)}
