"""VisualBERT: single-stream visio-linguistic transformer.

TPU-native reimplementation of the reference (mmf/models/visual_bert.py:
601 lines): text tokens and projected region features are concatenated
into one sequence and run through a shared BERT trunk. Covers both heads:
``pretraining`` (masked LM over the text span) and classification
(``classifier``/``vqa``/``nlvr2`` with pair-concat pooling).

Input contract (identical SampleList fields): ``input_ids``,
``input_mask``, ``segment_ids``, ``image_feature_0``,
``image_info_0.max_features`` (+ ``lm_label_ids`` for pretraining,
``img0``/``img1`` nests for nlvr2).
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
    TransformerConfig,
    TransformerEncoder,
    _dense,
)
from mmf_tpu.ops.attention import make_attention_bias


class VisualBertEmbeddings(nn.Module):
    """Text embeddings + projected visual embeddings with their own
    position/type tables, concatenated (reference
    mmf/modules/embeddings.py:309-461)."""

    config: TransformerConfig
    visual_embedding_dim: int = 2048

    @nn.compact
    def __call__(self, input_ids, token_type_ids, visual_embeddings,
                 visual_embeddings_type, deterministic=True):
        cfg = self.config
        word_emb = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
            dtype=cfg.dtype,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            name="word_embeddings",
        )
        pos_emb = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            param_dtype=jnp.float32, dtype=cfg.dtype,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            name="position_embeddings",
        )
        type_emb = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
            dtype=cfg.dtype,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            name="token_type_embeddings",
        )

        # text span
        seq_len = input_ids.shape[1]
        positions = jnp.arange(seq_len)[None, :]
        from mmf_tpu.modules.transformer import apply_padding_idx

        text = (
            apply_padding_idx(
                word_emb(input_ids.astype(jnp.int32)), input_ids,
                cfg.pad_token_id,
            )
            + pos_emb(positions)
            + type_emb(token_type_ids.astype(jnp.int32))
        )

        # visual span: separate pos/type tables, initialized from the text
        # tables when special_visual_initialize (handled by the weight
        # converter; fresh training initializes them identically anyway)
        proj = _dense(cfg, cfg.hidden_size, "projection")(visual_embeddings)
        v_len = visual_embeddings.shape[1]
        v_positions = jnp.zeros((1, v_len), jnp.int32)
        v_pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            param_dtype=jnp.float32, dtype=cfg.dtype,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            name="position_embeddings_visual",
        )(v_positions)
        v_type = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
            dtype=cfg.dtype,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            name="token_type_embeddings_visual",
        )(visual_embeddings_type.astype(jnp.int32))
        visual = proj + v_pos + v_type

        x = jnp.concatenate([text, visual], axis=1)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="layer_norm",
        )(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic)
        return x


class VisualBertBase(nn.Module):
    config: TransformerConfig
    visual_embedding_dim: int = 2048

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 visual_embeddings, visual_embeddings_type,
                 deterministic=True):
        cfg = self.config
        x = VisualBertEmbeddings(
            cfg, self.visual_embedding_dim, name="embeddings"
        )(input_ids, token_type_ids, visual_embeddings,
          visual_embeddings_type, deterministic)
        bias = make_attention_bias(attention_mask, cfg.dtype)
        x = TransformerEncoder(cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )
        pooled = Pooler(cfg, name="pooler")(x)
        return x, pooled


@registry.register_model("visual_bert")
class VisualBERT(BaseModel):

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        mmf/models/visual_bert.py:469-470: get_optimizer_parameters_for_bert /
        get_bert_configured_parameters)."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/visual_bert/pretrain.yaml"

    @classmethod
    def format_state_key(cls, key: str) -> str:
        return (
            key.replace("bert.bert", "model.bert")
            .replace("bert.cls", "model.cls")
            .replace("bert.classifier", "model.classifier")
        )

    def _tcfg(self) -> TransformerConfig:
        return TransformerConfig.from_dict(
            {
                k: self.config.get(k)
                for k in (
                    "vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size", "hidden_act",
                    "hidden_dropout_prob", "attention_probs_dropout_prob",
                    "max_position_embeddings", "type_vocab_size",
                    "layer_norm_eps", "dtype", "remat", "quant",
                )
                if self.config.get(k) is not None
            }
        )

    # -- input massaging (reference visual_bert.py:444-556) ---------------
    def _prepare_inputs(self, sample_list) -> Dict[str, jnp.ndarray]:
        head = self.config.get("training_head_type", "classification")
        input_ids = sample_list["input_ids"]
        input_mask = sample_list["input_mask"]
        token_type_ids = sample_list.get(
            "segment_ids", jnp.zeros_like(input_ids)
        )

        if head == "nlvr2":
            input_ids = jnp.concatenate([input_ids, input_ids], axis=0)
            input_mask = jnp.concatenate([input_mask, input_mask], axis=0)
            token_type_ids = jnp.concatenate(
                [token_type_ids, token_type_ids], axis=0
            )
            feats = jnp.concatenate(
                [
                    sample_list["img0"]["image_feature_0"],
                    sample_list["img1"]["image_feature_0"],
                ],
                axis=0,
            )
            dims = jnp.concatenate(
                [
                    sample_list["img0"]["image_info_0"]["max_features"],
                    sample_list["img1"]["image_info_0"]["max_features"],
                ],
                axis=0,
            )
        else:
            feats = sample_list["image_feature_0"]
            info = sample_list.get("image_info_0", None)
            if info is not None and "max_features" in info:
                dims = info["max_features"]
            else:
                dims = jnp.full((feats.shape[0],), feats.shape[1])

        # image_mask = arange(num_regions) < max_features
        image_mask = (
            jnp.arange(feats.shape[1])[None, :] < dims.reshape(-1, 1)
        ).astype(input_mask.dtype)
        attention_mask = jnp.concatenate([input_mask, image_mask], axis=-1)

        out = {
            "input_ids": input_ids,
            "input_mask": input_mask,
            "token_type_ids": token_type_ids,
            "visual_embeddings": feats,
            "visual_embeddings_type": jnp.zeros_like(image_mask),
            "attention_mask": attention_mask,
        }
        if head == "pretraining":
            lm = sample_list["lm_label_ids"]
            pad = jnp.full(
                (lm.shape[0], attention_mask.shape[1] - lm.shape[1]), -1,
                lm.dtype,
            )
            out["masked_lm_labels"] = jnp.concatenate([lm, pad], axis=-1)
        return out

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        cfg = self._tcfg()
        head = self.config.get("training_head_type", "classification")
        inputs = self._prepare_inputs(sample_list)
        deterministic = not train

        sequence_output, pooled_output = VisualBertBase(
            cfg,
            visual_embedding_dim=self.config.get("visual_embedding_dim", 2048),
            name="bert",
        )(
            inputs["input_ids"],
            inputs["attention_mask"],
            inputs["token_type_ids"],
            inputs["visual_embeddings"],
            inputs["visual_embeddings_type"],
            deterministic,
        )

        output_dict: Dict[str, Any] = {}
        if head == "pretraining":
            logits = MLMHead(cfg, name="cls")(sequence_output)
            labels = inputs["masked_lm_labels"]
            valid = labels != -1
            safe = jnp.where(valid, labels, 0).astype(jnp.int32)
            logprobs = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            picked = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[
                ..., 0
            ]
            masked_lm_loss = -jnp.sum(
                jnp.where(valid, picked, 0.0)
            ) / jnp.maximum(jnp.sum(valid), 1)
            dataset_name = sample_list.get("dataset_name", "unknown")
            dataset_type = sample_list.get("dataset_type", "train")
            # NSP score from BertPreTrainingHeads (reference
            # visual_bert.py:268-270 self.cls returns it; no loss is
            # attached upstream, but the head's weights live in zoo
            # checkpoints and need a conversion target)
            output_dict["seq_relationship_score"] = nn.Dense(
                2, name="seq_relationship"
            )(pooled_output)
            output_dict["scores"] = logits.reshape(-1, cfg.vocab_size)
            output_dict["losses"] = {
                f"{dataset_type}/{dataset_name}/masked_lm_loss": masked_lm_loss
            }
        else:
            if head == "nlvr2":
                b = pooled_output.shape[0]
                pooled_output = jnp.concatenate(
                    [pooled_output[: b // 2], pooled_output[b // 2 :]], axis=1
                )
            if self.config.get("pooler_strategy", "default") == "vqa":
                # representation of second-last text token
                idx = jnp.sum(inputs["input_mask"], axis=1) - 2
                pooled_output = jnp.take_along_axis(
                    sequence_output,
                    idx[:, None, None].astype(jnp.int32),
                    axis=1,
                )[:, 0]
            pooled_output = nn.Dropout(cfg.hidden_dropout_prob)(
                pooled_output, deterministic
            )
            x = PredictionHeadTransform(cfg, name="classifier_transform")(
                pooled_output
            )
            num_labels = self.config.get("num_labels", 2)
            logits = nn.Dense(
                num_labels, dtype=cfg.dtype, param_dtype=jnp.float32,
                name="classifier_logits",
            )(x)
            output_dict["scores"] = logits.reshape(-1, num_labels).astype(
                jnp.float32
            )
            # pooled representation exposed for composition (KRISP feeds
            # it to its graph network / bilinear pointer net,
            # reference krisp.py:177-204)
            output_dict["pooled_output"] = pooled_output
        return output_dict
