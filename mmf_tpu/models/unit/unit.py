"""UniT: unified transformer for detection + VQA + GLUE multi-task
(parity with mmf/models/unit/ — unit.py, unit_base_model.py,
transformer.py, backbone.py, misc.py; 1,681 LoC in the reference).

Architecture: conv backbone (ResNet) -> DETR transformer encoder over
image tokens (+ BERT text encoder for VL/GLUE tasks) -> per-task decoders
with learned queries (shared or separate) -> task heads:
  - detection: class logits + box cxcywh + Hungarian-matched losses,
  - vqa/vl: classifier over decoder outputs,
  - glue: classifier over text decoder outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.models.unit.matcher import HungarianMatcher
from mmf_tpu.modules.resnet import ResNet
from mmf_tpu.modules.transformer import (
    TextEmbeddings,
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import dot_product_attention, make_attention_bias
from mmf_tpu.utils.box_ops import box_cxcywh_to_xyxy, generalized_box_iou


def sine_position_embedding(hh: int, ww: int, hidden: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """DETR's 2D sine position encoding over an hh x ww grid, normalized
    (reference unit/backbone.py:91-133 with an all-valid mask). Returns
    [hh*ww, hidden] with the y-feature half first."""
    num_pos_feats = hidden // 2
    scale = 2 * jnp.pi
    eps = 1e-6
    y_embed = jnp.arange(1, hh + 1, dtype=jnp.float32)[:, None]
    x_embed = jnp.arange(1, ww + 1, dtype=jnp.float32)[None, :]
    y_embed = jnp.broadcast_to(y_embed, (hh, ww)) / (hh + eps) * scale
    x_embed = jnp.broadcast_to(x_embed, (hh, ww)) / (ww + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
    ).reshape(hh, ww, -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3
    ).reshape(hh, ww, -1)
    pos = jnp.concatenate([pos_y, pos_x], axis=2)
    return pos.reshape(hh * ww, hidden)


class BboxMLP(nn.Module):
    """DETR's 3-layer box head (reference unit/unit_base_model.py:82-96)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="layer0")(x))
        x = nn.relu(nn.Dense(self.hidden, name="layer1")(x))
        return nn.Dense(4, name="layer2")(x)


def _split(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)


def _merge(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class DETRDecoderLayer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(self, queries, memory, memory_bias=None, deterministic=True):
        c = self.cfg
        h = c.num_attention_heads
        # self attention over queries
        q = nn.Dense(c.hidden_size, name="self_q")(queries)
        k = nn.Dense(c.hidden_size, name="self_k")(queries)
        v = nn.Dense(c.hidden_size, name="self_v")(queries)
        # DETR passes its transformer dropout to nn.MultiheadAttention,
        # which applies it to the attention probs (reference
        # models/unit/transformer.py)
        rate = 0.0 if deterministic else c.attention_probs_dropout_prob
        sa = _merge(dot_product_attention(
            _split(q, h), _split(k, h), _split(v, h),
            dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
        ))
        sa = nn.Dense(c.hidden_size, name="self_out")(sa)
        queries = nn.LayerNorm(name="ln1")(queries + nn.Dropout(
            c.hidden_dropout_prob)(sa, deterministic))
        # cross attention to memory
        q = nn.Dense(c.hidden_size, name="cross_q")(queries)
        k = nn.Dense(c.hidden_size, name="cross_k")(memory)
        v = nn.Dense(c.hidden_size, name="cross_v")(memory)
        ca = _merge(dot_product_attention(
            _split(q, h), _split(k, h), _split(v, h), memory_bias,
            dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
        ))
        ca = nn.Dense(c.hidden_size, name="cross_out")(ca)
        queries = nn.LayerNorm(name="ln2")(queries + nn.Dropout(
            c.hidden_dropout_prob)(ca, deterministic))
        # ffn
        ff = nn.Dense(c.intermediate_size, name="ffn1")(queries)
        ff = nn.relu(ff)
        ff = nn.Dense(c.hidden_size, name="ffn2")(ff)
        queries = nn.LayerNorm(name="ln3")(queries + nn.Dropout(
            c.hidden_dropout_prob)(ff, deterministic))
        return queries


# reference configs nest the DETR knobs under base_args
# (configs/models/unit/defaults.yaml:20-50); this maps them onto the
# flat keys this redesign reads (flat keys win when both are present)
_BASE_ARGS_MAP = {
    "enc_layers": "num_encoder_layers",
    "dec_layers": "num_decoder_layers",
    "nheads": "num_attention_heads",
    "encoder_hidden_dim": "hidden_size",
    "dim_feedforward": "intermediate_size",
    "dropout": "dropout",
    "set_cost_class": "cost_class",
    "set_cost_bbox": "cost_bbox",
    "set_cost_giou": "cost_giou",
    "bbox_loss_coef": "bbox_coef",
    "giou_loss_coef": "giou_coef",
    "eos_coef": "eos_coef",
    "num_queries": "num_queries",
    "decoder_hidden_dim": "decoder_hidden_dim",
    "attribute_class_num": "attribute_class_num",
}


@registry.register_model("unit")
class UniT(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/unit/defaults.yaml"

    def _merged_config(self):
        import re

        c = dict(self.config or {})
        ba = dict(c.get("base_args", {}) or {})
        for src, dst in _BASE_ARGS_MAP.items():
            if src in ba and dst not in c:
                c[dst] = ba[src]
        if "share_decoders" in ba and "separate_decoders" not in c:
            c["separate_decoders"] = not ba["share_decoders"]
        if "backbone" in ba and "backbone_depth" not in c:
            m = re.match(r"resnet(\d+)", str(ba["backbone"]))
            if m:
                c["backbone_depth"] = int(m.group(1))
        return c

    def _tcfg(self):
        c = self._merged_config()
        hidden = c.get("hidden_size", 256)
        return TransformerConfig.from_dict(
            {
                "hidden_size": hidden,
                "num_hidden_layers": c.get("num_encoder_layers", 6),
                "num_attention_heads": c.get("num_attention_heads", 8),
                "intermediate_size": c.get("intermediate_size", hidden * 4),
                "hidden_dropout_prob": c.get("dropout", 0.1),
                # DETR uses ONE dropout value for FFN and attention probs
                # (reference models/unit/transformer.py MultiheadAttention)
                "attention_probs_dropout_prob": c.get("dropout", 0.1),
                "vocab_size": c.get("vocab_size", 30522),
                "dtype": c.get("dtype", "float32"),
            }
        )

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        c = self._merged_config()
        cfg = self._tcfg()
        hidden = cfg.hidden_size
        dataset = sample_list.get("dataset_name", "detection_coco")
        task_type = c.get("task_map", {}).get(dataset, c.get(
            "default_task_type", "detection"))
        num_queries = c.get("num_queries", 100)
        if not isinstance(num_queries, int):
            # reference shape: base_args.num_queries[task][dataset]
            per_task = num_queries.get(task_type, {})
            num_queries = (per_task if isinstance(per_task, int)
                           else per_task.get(dataset, 100)) or 100

        memory_parts = []
        memory_masks = []
        if "image" in sample_list:
            feats = ResNet(
                depth=c.get("backbone_depth", 50), features_only=True,
                name="backbone",
            )(sample_list["image"], train)
            b, hh, ww, ch = feats.shape
            tokens = nn.Dense(hidden, name="input_proj")(
                feats.reshape(b, hh * ww, ch)
            )
            # DETR sine position encoding over the feature grid
            pos = sine_position_embedding(hh, ww, hidden)[None]
            memory_parts.append(tokens + pos)
            memory_masks.append(jnp.ones((b, hh * ww), jnp.int32))
        elif "image_feature_0" in sample_list:
            tokens = nn.Dense(hidden, name="input_proj")(
                sample_list["image_feature_0"]
            )
            memory_parts.append(tokens)
            memory_masks.append(
                jnp.ones(tokens.shape[:2], jnp.int32)
            )

        if task_type in ("vl", "glue") and "input_ids" in sample_list:
            text = TextEmbeddings(cfg, name="text_embeddings")(
                sample_list["input_ids"],
                sample_list.get("segment_ids"),
                deterministic=deterministic,
            )
            text = nn.Dense(hidden, name="text_proj")(text)
            memory_parts.append(text)
            memory_masks.append(
                sample_list.get(
                    "input_mask",
                    jnp.ones(text.shape[:2], jnp.int32),
                ).astype(jnp.int32)
            )

        memory = jnp.concatenate(memory_parts, axis=1)
        # padding mask over the concatenated memory: text pad tokens must
        # not receive attention in the encoder or the decoder's
        # cross-attention (reference DETR passes key_padding_mask through
        # both, models/unit/transformer.py)
        memory_mask = jnp.concatenate(memory_masks, axis=1)
        bias = make_attention_bias(memory_mask, cfg.dtype)
        memory = TransformerEncoder(cfg, name="encoder")(
            memory, bias=bias, deterministic=deterministic
        )

        B = memory.shape[0]
        query_key = task_type if c.get("separate_decoders", True) else "shared"
        queries = self.param(
            f"query_embed_{query_key}", nn.initializers.normal(0.02),
            (num_queries, hidden),
        )
        x = jnp.broadcast_to(queries[None], (B, num_queries, hidden))
        intermediates = []
        for i in range(c.get("num_decoder_layers", 6)):
            x = DETRDecoderLayer(cfg, name=f"decoder_{query_key}_{i}")(
                x, memory, bias, deterministic
            )
            intermediates.append(x)

        ds = dataset
        dt = sample_list.get("dataset_type", "train")
        output: Dict[str, Any] = {}

        if task_type == "detection":
            num_classes = c.get("num_classes", 91)
            class_embed = nn.Dense(num_classes + 1, name="class_embed")
            bbox_embed = BboxMLP(hidden, name="bbox_embed")
            logits = class_embed(x)
            boxes = nn.sigmoid(bbox_embed(x))
            output["scores"] = logits
            output["pred_logits"] = logits  # detection-report key
            output["pred_boxes"] = boxes
            if train and "labels" in sample_list and "boxes" in sample_list:
                losses = self._detection_losses(
                    logits, boxes, sample_list, num_classes
                )
                # deep supervision: the same heads + Hungarian losses on
                # every intermediate decoder layer (reference
                # unit.py:247-250, unit_base_model.py:357-368)
                if c.get("aux_loss", True):
                    for li, inter in enumerate(intermediates[:-1]):
                        aux = self._detection_losses(
                            class_embed(inter), nn.sigmoid(bbox_embed(inter)),
                            sample_list, num_classes,
                        )
                        losses.update(
                            {f"{k}_{li}": v for k, v in aux.items()}
                        )
                output["losses"] = {
                    f"{dt}/{ds}/{k}": v for k, v in losses.items()
                }
        else:
            num_labels = c.get("heads", {}).get(dataset, {}).get(
                "num_labels", c.get("num_labels", 3129)
            )
            pooled = x[:, 0]
            h1 = nn.relu(nn.Dense(hidden, name=f"clf1_{dataset}")(pooled))
            logits = nn.Dense(num_labels, name=f"clf2_{dataset}")(h1)
            output["scores"] = logits.reshape(-1, num_labels)
        return output

    def _detection_losses(self, logits, boxes, sample_list, num_classes):
        """Hungarian-matched CE + L1 + GIoU losses (reference
        unit_base_model.py)."""
        tgt_labels = sample_list["labels"]  # [B, T] padded with -1
        tgt_boxes = sample_list["boxes"]    # [B, T, 4] cxcywh
        num_targets = jnp.sum(tgt_labels >= 0, axis=1)

        matcher = HungarianMatcher(
            self._merged_config().get("cost_class", 1.0),
            self._merged_config().get("cost_bbox", 5.0),
            self._merged_config().get("cost_giou", 2.0),
        )
        safe_labels = jnp.where(tgt_labels < 0, 0, tgt_labels)
        match = matcher(
            logits, boxes, safe_labels, tgt_boxes, num_targets
        )  # [B, Q] target idx or -1

        matched = match >= 0
        safe_match = jnp.where(matched, match, 0)
        # class targets: matched -> label; unmatched -> no-object class
        cls_target = jnp.where(
            matched,
            jnp.take_along_axis(safe_labels, safe_match, axis=1),
            num_classes,
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(lp, cls_target[..., None], -1)[..., 0]
        # reference down-weights the no-object class (eos_coef 0.1)
        weights = jnp.where(matched, 1.0, self._merged_config().get("eos_coef", 0.1))
        loss_ce = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)

        mboxes = jnp.take_along_axis(
            tgt_boxes, safe_match[..., None], axis=1
        )
        l1 = jnp.sum(jnp.abs(boxes - mboxes), axis=-1)
        denom = jnp.maximum(jnp.sum(matched), 1)
        loss_bbox = jnp.sum(l1 * matched) / denom

        def giou_b(pb, tb):
            return jnp.diagonal(
                generalized_box_iou(
                    box_cxcywh_to_xyxy(pb), box_cxcywh_to_xyxy(tb)
                )
            )

        giou = jax.vmap(giou_b)(boxes, mboxes)
        loss_giou = jnp.sum((1 - giou) * matched) / denom
        return {
            "detection_ce": loss_ce,
            "detection_bbox": loss_bbox * self._merged_config().get("bbox_coef", 5.0),
            "detection_giou": loss_giou * self._merged_config().get("giou_coef", 2.0),
        }
