"""LoRRA: Pythia + OCR context branch (parity with mmf/models/lorra.py)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.pythia import Pythia


@registry.register_model("lorra")
class LoRRA(Pythia):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/lorra/defaults.yaml"

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        deterministic = not train
        texts = self._word_embedding(sample_list["text"])
        text_total = self._text_embedding_total(texts, deterministic)
        image_total, _ = self._feature_embedding_total(
            "image", sample_list, text_total, deterministic
        )
        # context (OCR) branch with order vectors appended to features
        extra = {"order_vectors": sample_list.get("order_vectors", None)}
        context_total, _ = self._feature_embedding_total(
            "context", sample_list, text_total, deterministic, extra=extra
        )
        joint = self._combine_lorra(
            image_total, text_total, context_total, deterministic
        )
        scores = self._classify(joint, deterministic)
        return {"scores": scores}

    def _combine_lorra(self, image_total, text_total, context_total,
                       deterministic):
        from mmf_tpu.modules.layers import ModalCombineLayer

        cc = self.config["image_text_modal_combine"]
        layer = ModalCombineLayer(
            cc["type"], 0, 0, cc.get("params", {}),
            name="image_text_multi_modal_combine_layer",
        )
        # reference passes [image, text, context] into the combine layer,
        # which concatenates context-joint features (layers.py:369-403)
        return layer(
            image_total, text_total, context_total,
            deterministic=deterministic,
        )
