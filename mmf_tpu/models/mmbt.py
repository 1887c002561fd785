"""MMBT: supervised multimodal bitransformer.

TPU-native reimplementation of the reference (mmf/models/mmbt.py:643):
modal tokens (encoder output projected into BERT token space, with
optional start/end tokens borrowed from the text word-embedding table)
are concatenated before the text tokens and the whole sequence runs
through one BERT trunk. Classification and pretraining (MLM) heads.

Input contract: ``image`` (raw, encoded by modal_encoder) or
``image_feature_0``/``input_modal`` when ``direct_features_input``;
``input_ids``, ``input_mask``, ``segment_ids``; ``lm_label_ids`` for
pretraining.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.encoders import build_image_encoder
from mmf_tpu.modules.transformer import (
    MLMHead,
    Pooler,
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import make_attention_bias


class MMBTTrunk(nn.Module):
    """Shared-embedding multimodal BERT (reference MMBTModel +
    ModalEmbeddings, mmbt.py:67-326)."""

    config: TransformerConfig
    modal_hidden_size: int = 2048
    use_modal_start_token: bool = True
    use_modal_end_token: bool = True

    @nn.compact
    def __call__(self, modal_tokens, input_ids, input_mask, token_type_ids,
                 modal_token_type, modal_start_token=None,
                 modal_end_token=None, deterministic=True):
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
        layer_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="embeddings_layer_norm",
        )
        dropout = nn.Dropout(cfg.hidden_dropout_prob)

        # ---- modal span -------------------------------------------------
        proj = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, param_dtype=jnp.float32,
            name="proj_embeddings",
        )(modal_tokens)
        pieces = []
        if modal_start_token is not None:
            pieces.append(word_emb(modal_start_token.astype(jnp.int32))[:, None])
        pieces.append(proj)
        if modal_end_token is not None:
            pieces.append(word_emb(modal_end_token.astype(jnp.int32))[:, None])
        modal = jnp.concatenate(pieces, axis=1)
        m_len = modal.shape[1]
        m_pos = pos_emb(jnp.arange(m_len)[None, :])
        m_type = type_emb(
            jnp.broadcast_to(
                modal_token_type.astype(jnp.int32), (modal.shape[0], m_len)
            )
        )
        modal = dropout(layer_norm(modal + m_pos + m_type), deterministic)

        # ---- text span ---------------------------------------------------
        t_len = input_ids.shape[1]
        from mmf_tpu.modules.transformer import apply_padding_idx

        text = (
            apply_padding_idx(
                word_emb(input_ids.astype(jnp.int32)), input_ids,
                getattr(cfg, "pad_token_id", 0),
            )
            + pos_emb(jnp.arange(t_len)[None, :])
            + type_emb(token_type_ids.astype(jnp.int32))
        )
        text = dropout(layer_norm(text), deterministic)

        x = jnp.concatenate([modal, text], axis=1)
        modal_mask = jnp.ones((x.shape[0], m_len), input_mask.dtype)
        attention_mask = jnp.concatenate([modal_mask, input_mask], axis=1)
        bias = make_attention_bias(attention_mask, cfg.dtype)

        seq = TransformerEncoder(cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )
        pooled = Pooler(cfg, name="pooler")(seq)
        return seq, pooled, m_len


@registry.register_model("mmbt")
class MMBT(BaseModel):

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        mmf/models/mmbt.py:642-643: get_optimizer_parameters_for_bert /
        get_bert_configured_parameters)."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/mmbt/pretrain.yaml"

    @classmethod
    def from_pretrained(cls, model_name_or_path, *args, **kwargs):
        """Hub-style load returning the interface wrapper
        (reference mmbt.py:626-633)."""
        from mmf_tpu.models.interfaces.mmbt import MMBTGridHMInterface
        from mmf_tpu.utils.checkpoint import load_pretrained_model

        loaded = load_pretrained_model(model_name_or_path)
        config = loaded["config"]
        model_config = config["model_config"]["mmbt"]
        model = cls(config=model_config)
        return MMBTGridHMInterface(
            model, config, loaded["checkpoint"].get("variables")
        )

    def _tcfg(self) -> TransformerConfig:
        text_params = (self.config.get("text_encoder", {}) or {}).get(
            "params", {}
        ) or {}
        base = {
            "hidden_size": text_params.get("hidden_size", 768),
            "num_hidden_layers": text_params.get("num_hidden_layers", 12),
            "num_attention_heads": text_params.get("num_attention_heads", 12),
            "intermediate_size": text_params.get(
                "intermediate_size", text_params.get("hidden_size", 768) * 4
            ),
            "vocab_size": text_params.get("vocab_size", 30522),
            "type_vocab_size": text_params.get("num_segments", 2),
            "dtype": self.config.get("dtype", "float32"),
            "quant": self.config.get("quant", "none"),
        }
        return TransformerConfig.from_dict(base)

    def _modal_token_type(self, segment_ids, num_max_segment):
        """Reference mmbt.py:395-418: pick the type id the text does NOT use."""
        max_id = jnp.max(segment_ids)
        min_id = jnp.min(segment_ids)
        one_segment = max_id == min_id
        token_value = jnp.where(
            one_segment,
            jnp.where(max_id == 0, 1, 0),
            jnp.where(max_id != num_max_segment - 1, num_max_segment - 1, 0),
        )
        return token_value.reshape(1, 1)

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        cfg = self._tcfg()
        deterministic = not train
        direct = self.config.get("direct_features_input", False)
        head = self.config.get("training_head_type", "classification")

        if direct:
            input_modal = sample_list.get(
                "input_modal", sample_list.get("image_feature_0")
            )
            modal_tokens = input_modal
        else:
            image = sample_list["image"]
            encoder = build_image_encoder(
                self.config.get("modal_encoder", {"type": "resnet152",
                                                  "params": {}})
            )
            modal_tokens = encoder(image, train)
        if modal_tokens.ndim == 2:
            modal_tokens = modal_tokens[:, None, :]

        input_ids = sample_list["input_ids"]
        input_mask = sample_list["input_mask"]
        segment_ids = sample_list["segment_ids"]

        modal_start_token = None
        modal_end_token = None
        if self.config.get("use_modal_start_token", True):
            modal_start_token = input_ids[:, 0]
        if self.config.get("use_modal_end_token", True):
            # last non-masked token (<sep>); then shift text left
            gather_index = jnp.sum(input_mask, axis=1) - 1
            modal_end_token = jnp.take_along_axis(
                input_ids, gather_index[:, None].astype(jnp.int32), axis=1
            )[:, 0]
            input_ids = jnp.concatenate(
                [input_ids[:, 1:], input_ids[:, -1:]], axis=1
            )
            input_mask = jnp.concatenate(
                [input_mask[:, 1:], jnp.zeros_like(input_mask[:, -1:])], axis=1
            )
            segment_ids = jnp.concatenate(
                [segment_ids[:, 1:], segment_ids[:, -1:]], axis=1
            )

        num_max_segment = (
            (self.config.get("text_encoder", {}) or {})
            .get("params", {})
            .get("num_segments", 2)
        )
        modal_token_type = self._modal_token_type(segment_ids, num_max_segment)

        seq, pooled, m_len = MMBTTrunk(
            cfg,
            modal_hidden_size=self.config.get("modal_hidden_size", 2048),
            name="bert",
        )(
            modal_tokens, input_ids, input_mask, segment_ids,
            modal_token_type, modal_start_token, modal_end_token,
            deterministic,
        )

        output: Dict[str, Any] = {}
        if head == "pretraining":
            logits = MLMHead(cfg, name="cls")(seq[:, m_len:])
            labels = sample_list["lm_label_ids"]
            valid = labels != -1
            safe = jnp.where(valid, labels, 0).astype(jnp.int32)
            logprobs = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            picked = jnp.take_along_axis(logprobs, safe[..., None], -1)[..., 0]
            loss = -jnp.sum(jnp.where(valid, picked, 0.0)) / jnp.maximum(
                jnp.sum(valid), 1
            )
            ds = sample_list.get("dataset_name", "unknown")
            dt = sample_list.get("dataset_type", "train")
            output["scores"] = logits.reshape(-1, cfg.vocab_size)
            output["losses"] = {f"{dt}/{ds}/masked_lm_loss": loss}
        else:
            if self.config.get("fused_feature_only", False):
                output["fused_feature"] = pooled
            dropped = nn.Dropout(cfg.hidden_dropout_prob)(
                pooled, deterministic
            )
            num_labels = self.config.get("num_labels", 2)
            logits = nn.Dense(
                num_labels, dtype=cfg.dtype, param_dtype=jnp.float32,
                name="classifier",
            )(dropped)
            output["scores"] = logits.reshape(-1, num_labels).astype(
                jnp.float32
            )
        return output
