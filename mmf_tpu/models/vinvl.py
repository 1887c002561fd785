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
                "max_position_embeddings": c.get(
                    "max_position_embeddings", 512
                ),
                "type_vocab_size": c.get("type_vocab_size", 2),
                "hidden_dropout_prob": c.get("hidden_dropout_prob", 0.1),
                "attention_probs_dropout_prob": c.get(
                    "attention_probs_dropout_prob", 0.1
                ),
                "layer_norm_eps": c.get("layer_norm_eps", 1e-12),
                "dtype": c.get("dtype", "float32"),
                "quant": c.get("quant", "none"),
            }
        )

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        cfg = self._tcfg()
        c = self.config
        deterministic = not train
        head = c.get("training_head_type", "classification")

        img_feats = sample_list["image_feature_0"]
        input_mask = sample_list["input_mask"]
        # MLM runs on the masked caption; the three-way contrastive loss
        # runs on a SECOND forward over the corrupted caption/tags
        # (reference vinvl.py:358-390: mlm_forward + contrastive_forward)
        is_pretraining = head == "pretraining"
        input_ids = sample_list[
            "input_ids_masked"
            if is_pretraining and "input_ids_masked" in sample_list
            else "input_ids"
        ]
        segment_ids = sample_list.get("segment_ids",
                                      jnp.zeros_like(input_ids))
        image_mask = sample_list.get(
            "image_mask", jnp.ones(img_feats.shape[:2], input_mask.dtype)
        )

        # trunk modules constructed once, applied to one or two inputs
        embeddings = TextEmbeddings(cfg, name="embeddings")
        img_projection = nn.Dense(cfg.hidden_size, name="img_projection")
        img_ln = None
        if c.get("use_img_layernorm", True):
            # reference default: LayerNorm on the image encoding
            # (vinvl.py:55-62, use_img_layernorm=True, eps 1e-12)
            img_ln = nn.LayerNorm(
                epsilon=c.get("img_layer_norm_eps", 1e-12),
                name="img_layer_norm",
            )
        encoder = TransformerEncoder(cfg, name="encoder")
        pooler = Pooler(cfg, name="pooler")

        def trunk(ids, seg, txt_mask):
            text = embeddings(ids, seg, deterministic=deterministic)
            img = img_projection(img_feats)
            if img_ln is not None:
                img = img_ln(img)
            img = nn.Dropout(cfg.hidden_dropout_prob)(img, deterministic)
            x = jnp.concatenate([text, img], axis=1)
            mask = jnp.concatenate([txt_mask, image_mask], axis=1)
            seq = encoder(
                x, bias=make_attention_bias(mask, cfg.dtype),
                deterministic=deterministic,
            )
            return seq, pooler(seq)

        seq, pooled = trunk(input_ids, segment_ids, input_mask)

        ds = sample_list.get("dataset_name", "unknown")
        dt = sample_list.get("dataset_type", "train")
        output: Dict[str, Any] = {}
        if is_pretraining:
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
                if "input_ids_corrupt" in sample_list:
                    _, pooled_c = trunk(
                        sample_list["input_ids_corrupt"],
                        sample_list.get("segment_ids_corrupt", segment_ids),
                        sample_list.get("input_mask_corrupt", input_mask),
                    )
                else:
                    pooled_c = pooled
                three_way = nn.Dense(3, name="three_way_classifier")(pooled_c)
                labels3 = sample_list["contrastive_labels"].astype(jnp.int32)
                lp = nn.log_softmax(three_way.astype(jnp.float32), -1)
                losses[f"{dt}/{ds}/three_way_contrastive_loss"] = -jnp.mean(
                    jnp.take_along_axis(lp, labels3[:, None], 1)
                )
            output["scores"] = logits.reshape(-1, cfg.vocab_size)
            output["losses"] = losses
        else:
            # reference head: BertPooler -> [num_layers x (dropout +
            # transform)] -> Linear; default mlp num_layers=0
            # (vinvl.py:196-209 + heads/mlp.py:50-62)
            num_labels = c.get("num_labels", 3129)
            x = pooled
            for i in range(int(c.get("mlp_num_layers", 0))):
                x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic)
                x = PredictionHeadTransform(
                    cfg, name=f"classifier_transform_{i}"
                )(x)
            logits = nn.Dense(num_labels, name="classifier_logits")(x)
            output["scores"] = logits.reshape(-1, num_labels).astype(
                jnp.float32
            )
            if "labels" in sample_list:
                # in-model CE, keyed "ce" like the reference
                # (vinvl.py:230-234)
                labels = sample_list["labels"].astype(jnp.int32)
                lp = nn.log_softmax(logits.astype(jnp.float32), -1)
                output["losses"] = {
                    f"{dt}/{ds}/ce": -jnp.mean(
                        jnp.take_along_axis(lp, labels[:, None], 1)
                    )
                }
        return output
