"""TopDownBottomUp module-style model
(parity with mmf/models/top_down_bottom_up.py:62)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.layers import ClassifierLayer, ReLUWithWeightNormFC
from mmf_tpu.modules.embeddings import ImageFeatureEmbedding, TextEmbedding


@registry.register_model("top_down_bottom_up")
class TopDownBottomUp(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return None

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        c = self.config or {}
        hidden = c.get("hidden_dim", 1024)

        text = sample_list["text"]
        if text.dtype in (jnp.int32, jnp.int64):
            text = nn.Embed(
                c.get("text_vocab_size", 30522), c.get("embedding_dim", 300),
                name="word_embedding",
            )(text.astype(jnp.int32))

        te_cfg = c.get("text_embedding", {"type": "bilstm", "params": {
            "hidden_dim": hidden, "embedding_dim": 300}})
        text_emb = TextEmbedding(
            te_cfg["type"], te_cfg.get("params", {}), name="text_embedding"
        )(text)

        image_feat = sample_list["image_feature_0"]
        info = sample_list.get("image_info_0", {}) or {}
        dims = info.get("max_features", jnp.full(
            (image_feat.shape[0],), image_feat.shape[1]))
        att_cfg = c.get("attention", {
            "modal_combine": {"type": "non_linear_element_multiply",
                              "params": {"hidden_dim": hidden, "dropout": 0}},
            "transform": {"type": "linear", "params": {"out_dim": 1}},
        })
        image_emb, _ = ImageFeatureEmbedding(
            image_feat.shape[-1], text_emb.shape[-1],
            modal_combine=att_cfg["modal_combine"],
            transform=att_cfg["transform"],
            name="image_attention_model",
        )(image_feat, text_emb, dims, None, deterministic)

        t = ReLUWithWeightNormFC(hidden, name="non_linear_text")(text_emb)
        v = ReLUWithWeightNormFC(hidden, name="non_linear_image")(image_emb)
        joint = t * v

        cc = c.get("classifier", {"type": "weight_norm",
                                  "params": {"hidden_dim": hidden,
                                             "dropout": 0.5}})
        num_choices = c.get("num_labels", 3129)
        scores = ClassifierLayer(
            cc["type"], 0, num_choices, params=cc.get("params", {}),
            name="classifier",
        )(joint, deterministic)
        return {"scores": scores}
