"""LXMERT: cross-modality encoder with language/vision/cross layer stacks
(parity with mmf/models/lxmert.py:786).

Architecture: 9 language layers, 5 relational (vision) layers, 5 cross
layers where one SHARED cross-attention module attends both directions,
followed by per-stream self-attention and FFNs. Heads: masked LM, matched
(ITM), visual-obj prediction (obj/attr/feat), QA.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.transformer import (
    ACT2FN,
    MLMHead,
    Pooler,
    PredictionHeadTransform,
    TextEmbeddings,
    TransformerConfig,
    TransformerLayer,
)
from mmf_tpu.ops.attention import dot_product_attention, make_attention_bias


def _split(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)


def _merge(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class CrossAttLayer(nn.Module):
    """Cross attention + output (reference lxmert.py:69-84)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, input_tensor, ctx_tensor, ctx_bias=None,
                 deterministic=True):
        c = self.cfg
        h = c.num_attention_heads
        q = nn.Dense(c.hidden_size, name="query", dtype=c.dtype,
                     param_dtype=jnp.float32)(input_tensor)
        k = nn.Dense(c.hidden_size, name="key", dtype=c.dtype,
                     param_dtype=jnp.float32)(ctx_tensor)
        v = nn.Dense(c.hidden_size, name="value", dtype=c.dtype,
                     param_dtype=jnp.float32)(ctx_tensor)
        rate = 0.0 if deterministic else c.attention_probs_dropout_prob
        ctx = dot_product_attention(
            _split(q, h), _split(k, h), _split(v, h), ctx_bias,
            dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
            train=not deterministic,
        )
        out = nn.Dense(c.hidden_size, name="output_dense", dtype=c.dtype,
                       param_dtype=jnp.float32)(_merge(ctx))
        out = nn.Dropout(c.hidden_dropout_prob)(out, deterministic)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="output_ln",
            dtype=c.dtype, param_dtype=jnp.float32,
        )(out + input_tensor)


class LXMERTXLayer(nn.Module):
    """(reference lxmert.py:233-292) — shared cross-attention module."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, lang, lang_bias, visn, visn_bias, deterministic=True):
        cross = CrossAttLayer(self.cfg, name="visual_attention")
        lang_att = cross(lang, visn, visn_bias, deterministic)
        visn_att = cross(visn, lang, lang_bias, deterministic)

        from mmf_tpu.modules.transformer import SelfAttention, FeedForward

        lang_att = SelfAttention(self.cfg, name="lang_self_att")(
            lang_att, bias=lang_bias, deterministic=deterministic
        )
        visn_att = SelfAttention(self.cfg, name="visn_self_att")(
            visn_att, bias=visn_bias, deterministic=deterministic
        )
        lang_out = FeedForward(self.cfg, name="lang_ffn")(
            lang_att, deterministic
        )
        visn_out = FeedForward(self.cfg, name="visn_ffn")(
            visn_att, deterministic
        )
        return lang_out, visn_out


class VisualFeatEncoder(nn.Module):
    """Region feature + box projection (reference lxmert.py:201-232)."""

    cfg: TransformerConfig
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4

    @nn.compact
    def __call__(self, feats, boxes, deterministic=True):
        c = self.cfg
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="visn_ln",
                         dtype=c.dtype, param_dtype=jnp.float32)(
            nn.Dense(c.hidden_size, name="visn_fc", dtype=c.dtype,
                     param_dtype=jnp.float32)(feats)
        )
        y = nn.LayerNorm(epsilon=c.layer_norm_eps, name="box_ln",
                         dtype=c.dtype, param_dtype=jnp.float32)(
            nn.Dense(c.hidden_size, name="box_fc", dtype=c.dtype,
                     param_dtype=jnp.float32)(boxes)
        )
        out = (x + y) / 2
        return nn.Dropout(c.hidden_dropout_prob)(out, deterministic)


@registry.register_model("lxmert")
class LXMERT(BaseModel):

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        mmf/models/lxmert.py:721-722: get_optimizer_parameters_for_bert /
        get_bert_configured_parameters)."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/lxmert/defaults.yaml"

    def _tcfg(self):
        c = self.config
        return TransformerConfig.from_dict(
            {
                "hidden_size": c.get("hidden_size", 768),
                "num_attention_heads": c.get("num_attention_heads", 12),
                "intermediate_size": c.get("intermediate_size", 3072),
                "vocab_size": c.get("vocab_size", 30522),
                "hidden_dropout_prob": c.get("hidden_dropout_prob", 0.1),
                "layer_norm_eps": c.get("layer_norm_eps", 1e-12),
                "dtype": c.get("dtype", "float32"),
            }
        )

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        cfg = self._tcfg()
        c = self.config
        deterministic = not train
        head = c.get("training_head_type", "pretraining")

        input_ids = sample_list["input_ids"]
        input_mask = sample_list["input_mask"]
        segment_ids = sample_list.get("segment_ids",
                                      jnp.zeros_like(input_ids))
        visual_feats = sample_list["image_feature_0"]
        info = sample_list.get("image_info_0", {}) or {}
        visual_pos = info.get(
            "bbox", jnp.zeros(visual_feats.shape[:2] + (4,), jnp.float32)
        )[:, :, :4]
        image_mask = sample_list.get(
            "image_mask", jnp.ones(visual_feats.shape[:2], input_mask.dtype)
        )

        lang_bias = make_attention_bias(input_mask, cfg.dtype)
        visn_bias = make_attention_bias(image_mask, cfg.dtype)

        lang = TextEmbeddings(cfg, name="embeddings")(
            input_ids, segment_ids, deterministic=deterministic
        )
        visn = VisualFeatEncoder(
            cfg, c.get("visual_feat_dim", 2048), c.get("visual_pos_dim", 4),
            name="visn_fc",
        )(visual_feats, visual_pos, deterministic)

        for i in range(c.get("l_layers", 9)):
            lang = TransformerLayer(cfg, name=f"l_layer_{i}")(
                lang, bias=lang_bias, deterministic=deterministic
            )
        for i in range(c.get("r_layers", 5)):
            visn = TransformerLayer(cfg, name=f"r_layer_{i}")(
                visn, bias=visn_bias, deterministic=deterministic
            )
        for i in range(c.get("x_layers", 5)):
            lang, visn = LXMERTXLayer(cfg, name=f"x_layer_{i}")(
                lang, lang_bias, visn, visn_bias, deterministic
            )

        pooled = Pooler(cfg, name="pooler")(lang)
        ds = sample_list.get("dataset_name", "unknown")
        dt = sample_list.get("dataset_type", "train")
        output: Dict[str, Any] = {}

        if head == "pretraining":
            losses = {}
            if c.get("task_mask_lm", True):
                logits = MLMHead(cfg, name="cls")(lang)
                labels = sample_list.get("lm_label_ids", None)
                if labels is not None:
                    valid = labels != -1
                    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
                    lp = nn.log_softmax(logits.astype(jnp.float32), -1)
                    picked = jnp.take_along_axis(
                        lp, safe[..., None], -1
                    )[..., 0]
                    losses[f"{dt}/{ds}/masked_lm_loss"] = -jnp.sum(
                        jnp.where(valid, picked, 0.0)
                    ) / jnp.maximum(jnp.sum(valid), 1)
                output["scores"] = logits.reshape(-1, cfg.vocab_size)
            if c.get("task_matched", True) and "is_correct" in sample_list:
                seq_rel = nn.Dense(2, name="seq_relationship")(pooled)
                labels = sample_list["is_correct"].astype(jnp.int32)
                lp = nn.log_softmax(seq_rel.astype(jnp.float32), -1)
                losses[f"{dt}/{ds}/matched_loss"] = -jnp.mean(
                    jnp.take_along_axis(lp, labels[:, None], 1)
                )
            if c.get("task_obj_predict", True) and \
                    "image_labels" in sample_list:
                x = PredictionHeadTransform(cfg, name="obj_transform")(visn)
                feat_pred = nn.Dense(
                    c.get("visual_feat_dim", 2048), name="feat_decoder"
                )(x)
                mask = (sample_list["image_labels"] == 1).astype(jnp.float32)
                se = jnp.sum((feat_pred - visual_feats) ** 2, -1)
                losses[f"{dt}/{ds}/feat_loss"] = jnp.sum(
                    se * mask
                ) / jnp.maximum(jnp.sum(mask), 1.0)
            if losses:
                output["losses"] = losses
        else:
            num_labels = c.get(
                "gqa_labels" if head == "gqa" else "num_labels", 3129
            )
            x = PredictionHeadTransform(cfg, name="classifier_transform")(
                pooled
            )
            logits = nn.Dense(num_labels, name="classifier_logits")(x)
            output["scores"] = logits.reshape(-1, num_labels).astype(
                jnp.float32
            )
        return output
