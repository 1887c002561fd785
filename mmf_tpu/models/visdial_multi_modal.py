"""Visual Dialog multi-modal model
(parity with mmf/models/visdial_multi_modal.py:95): Pythia-style encoding
per dialog turn + discriminative option scoring."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.pythia import Pythia
from mmf_tpu.modules.decoders import VisDialDiscriminator


@registry.register_model("visdial_multi_modal")
class VisDialMultiModalModel(Pythia):
    config: Any = None

    @classmethod
    def config_path(cls):
        return None

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        texts = self._word_embedding(sample_list["text"])
        text_total = self._text_embedding_total(texts, deterministic)
        image_total, _ = self._feature_embedding_total(
            "image", sample_list, text_total, deterministic
        )
        joint = self._combine(image_total, text_total, deterministic)

        dec_cfg = self.config.get("decoder", {"params": {
            "embedding_dim": 300, "hidden_dim": 512}})
        scores = VisDialDiscriminator(
            dec_cfg["params"].get("embedding_dim", 300),
            dec_cfg["params"].get("hidden_dim", joint.shape[-1]),
            name="decoder",
        )(joint[:, None, :], sample_list, deterministic)
        return {"scores": scores}
