"""MMFBert: BERT-ified Pythia (parity with mmf/models/mmf_bert.py:418).

Question through a BERT trunk; top-down attention over region features
conditioned on the pooled question; element-multiply fusion; classifier.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.pythia import Pythia
from mmf_tpu.modules.transformer import TransformerConfig, TransformerModel


@registry.register_model("mmf_bert")
class MMFBert(Pythia):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/mmf_bert/defaults.yaml"

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
        deterministic = not train
        cfg = self._tcfg()
        c = self.config
        head = c.get("training_head_type", "classification")
        seq, pooled = TransformerModel(cfg, name="bert")(
            sample_list["input_ids"],
            sample_list.get("input_mask"),
            sample_list.get("segment_ids"),
            deterministic=deterministic,
        )
        text_total = pooled

        ds = sample_list.get("dataset_name", "unknown")
        dt = sample_list.get("dataset_type", "train")
        if "pretraining" in head:
            # masked-LM + next-sentence heads (reference
            # mmf_bert.py:356-388: BertPreTrainingHeads + in-model CE)
            from mmf_tpu.modules.transformer import MLMHead

            logits = MLMHead(cfg, name="cls")(seq)
            output: Dict[str, Any] = {"logits": logits}
            labels = sample_list.get("lm_label_ids", None)
            if labels is not None:
                valid = labels != -1
                safe = jnp.where(valid, labels, 0).astype(jnp.int32)
                lp = nn.log_softmax(logits.astype(jnp.float32), -1)
                picked = jnp.take_along_axis(lp, safe[..., None], -1)[..., 0]
                losses = {
                    f"{dt}/{ds}/masked_lm_loss": -jnp.sum(
                        jnp.where(valid, picked, 0.0)
                    ) / jnp.maximum(jnp.sum(valid), 1)
                }
                is_next = sample_list.get("is_correct", None)
                if is_next is not None:
                    rel = nn.Dense(2, name="seq_relationship")(pooled)
                    output["seq_relationship_score"] = rel
                    rl = nn.log_softmax(rel.astype(jnp.float32), -1)
                    losses[f"{dt}/{ds}/next_sentence_loss"] = -jnp.mean(
                        jnp.take_along_axis(
                            rl, is_next.astype(jnp.int32)[:, None], 1
                        )
                    )
                output["losses"] = losses
            return output
        if "vqa" in head or head == "vizwiz":
            # representation of the 2nd-last real token
            # (reference mmf_bert.py:395-409)
            from mmf_tpu.modules.transformer import PredictionHeadTransform

            input_mask = sample_list.get(
                "input_mask", jnp.ones_like(sample_list["input_ids"])
            )
            idx = jnp.sum(input_mask, axis=1) - 2
            tok = jnp.take_along_axis(
                seq, idx[:, None, None].astype(jnp.int32), axis=1
            )[:, 0]
            tok = nn.Dropout(cfg.hidden_dropout_prob)(tok, deterministic)
            x = PredictionHeadTransform(cfg, name="vqa_transform")(tok)
            n = c.get("num_labels", 7371 if head == "vizwiz" else 3129)
            return {"scores": nn.Dense(n, name="vqa_classifier")(x)}
        if head in ("nlvr2", "visual_entailment"):
            from mmf_tpu.modules.transformer import PredictionHeadTransform

            x = nn.Dropout(cfg.hidden_dropout_prob)(pooled, deterministic)
            x = PredictionHeadTransform(cfg, name="ve_transform")(x)
            n = c.get("num_labels", 3 if head == "visual_entailment" else 2)
            return {"scores": nn.Dense(n, name="ve_classifier")(x)}

        # pythia-style fusion only for the classification fall-through —
        # the dedicated heads above never consume it, and building it
        # there would create dead parameters in checkpoints/optimizer
        image_total, _ = self._feature_embedding_total(
            "image", sample_list, text_total, deterministic
        )
        joint = self._combine(image_total, text_total, deterministic)
        scores = self._classify(joint, deterministic)
        return {"scores": scores}
