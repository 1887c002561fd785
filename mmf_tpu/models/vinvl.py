"""VinVL (Oscar+): tag-augmented single-stream BERT
(parity with mmf/models/vinvl.py:505).

Sequence = [text tokens ; tag tokens ; region features projected], one
BERT trunk; classification head or pretraining with masked LM + its
three-way contrastive loss over corrupted tag/text pairs.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.transformer import (
    MLMHead,
    Pooler,
    PredictionHeadTransform,
    TextEmbeddings,
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import make_attention_bias


@registry.register_model("vinvl")
class VinVL(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/vinvl/defaults.yaml"

    def _tcfg(self):
        c = self.config
        return TransformerConfig.from_dict(
            {
                "hidden_size": c.get("hidden_size", 768),
                "num_hidden_layers": c.get("num_hidden_layers", 12),
                "num_attention_heads": c.get("num_attention_heads", 12),
                "intermediate_size": c.get("intermediate_size", 3072),
                "vocab_size": c.get("vocab_size", 30522),
                "dtype": c.get("dtype", "float32"),
            }
        )

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        cfg = self._tcfg()
        c = self.config
        deterministic = not train
        head = c.get("training_head_type", "classification")

        input_ids = sample_list["input_ids"]  # text (+tags) token ids
        input_mask = sample_list["input_mask"]
        segment_ids = sample_list.get("segment_ids",
                                      jnp.zeros_like(input_ids))
        img_feats = sample_list["image_feature_0"]
        image_mask = sample_list.get(
            "image_mask", jnp.ones(img_feats.shape[:2], input_mask.dtype)
        )

        text = TextEmbeddings(cfg, name="embeddings")(
            input_ids, segment_ids, deterministic=deterministic
        )
        img = nn.Dense(cfg.hidden_size, name="img_projection")(img_feats)
        img = nn.Dropout(cfg.hidden_dropout_prob)(img, deterministic)

        x = jnp.concatenate([text, img], axis=1)
        attention_mask = jnp.concatenate([input_mask, image_mask], axis=1)
        bias = make_attention_bias(attention_mask, cfg.dtype)
        seq = TransformerEncoder(cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )
        pooled = Pooler(cfg, name="pooler")(seq)

        ds = sample_list.get("dataset_name", "unknown")
        dt = sample_list.get("dataset_type", "train")
        output: Dict[str, Any] = {}
        if head == "pretraining":
            losses = {}
            logits = MLMHead(cfg, name="cls")(seq[:, : input_ids.shape[1]])
            labels = sample_list.get("lm_label_ids", None)
            if labels is not None:
                valid = labels != -1
                safe = jnp.where(valid, labels, 0).astype(jnp.int32)
                lp = nn.log_softmax(logits.astype(jnp.float32), -1)
                picked = jnp.take_along_axis(lp, safe[..., None], -1)[..., 0]
                losses[f"{dt}/{ds}/masked_lm_loss"] = -jnp.sum(
                    jnp.where(valid, picked, 0.0)
                ) / jnp.maximum(jnp.sum(valid), 1)
            if "contrastive_labels" in sample_list:
                three_way = nn.Dense(3, name="three_way_classifier")(pooled)
                labels3 = sample_list["contrastive_labels"].astype(jnp.int32)
                lp = nn.log_softmax(three_way.astype(jnp.float32), -1)
                losses[f"{dt}/{ds}/three_way_contrastive_loss"] = -jnp.mean(
                    jnp.take_along_axis(lp, labels3[:, None], 1)
                )
            output["scores"] = logits.reshape(-1, cfg.vocab_size)
            output["losses"] = losses
        else:
            num_labels = c.get("num_labels", 3129)
            x = PredictionHeadTransform(cfg, name="classifier_transform")(
                pooled
            )
            logits = nn.Dense(num_labels, name="classifier_logits")(x)
            output["scores"] = logits.reshape(-1, num_labels).astype(
                jnp.float32
            )
        return output
