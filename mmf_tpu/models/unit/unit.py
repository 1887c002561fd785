"""UniT: unified transformer for detection + VQA + GLUE multi-task
(parity with mmf/models/unit/ — unit.py, unit_base_model.py,
transformer.py, backbone.py, misc.py; 1,681 LoC in the reference).

Faithful computation graph (see models/unit/transformer.py for the DETR
core): conv backbone -> 1x1 input projection -> DETR encoder over image
tokens with per-layer sine pos -> [optional residual, enc->dec
projection] -> memory = [encoded image ; projected BERT text states] ->
per-(task, dataset) decoders from zero-initialized targets with learned
query embeddings injected per layer -> task heads:
  - detection (unit.py:236-279): per-dataset class/bbox heads over every
    intermediate decoder state, Hungarian-matched CE+L1+GIoU losses with
    aux supervision, optional AttributeHead;
  - vl / glue (unit.py:281-318): BertPredictionHeadTransform + Linear on
    query 0, loss per supervised hidden state (loss_on_all_hs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.models.unit.matcher import HungarianMatcher
from mmf_tpu.models.unit.transformer import UniTTransformerCore
from mmf_tpu.modules.resnet import ResNet
from mmf_tpu.modules.transformer import (
    PredictionHeadTransform,
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import make_attention_bias
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


class AttributeHead(nn.Module):
    """Visual-Genome attribute head (reference unit_base_model.py:99-129):
    class-label embedding concat with the decoder state -> 2-layer MLP,
    relu on the OUTPUT logits (a quirk kept from the vqa-maskrcnn head)."""

    object_class_num: int
    attribute_class_num: int = 401

    @nn.compact
    def __call__(self, hidden_states, labels):
        cls_embed = nn.Embed(
            self.object_class_num + 1, 256,
            embedding_init=nn.initializers.normal(0.01), name="cls_embed",
        )(labels)
        x = jnp.concatenate([hidden_states, cls_embed], axis=-1)
        x = nn.Dense(
            512, kernel_init=nn.initializers.normal(0.01),
            name="attr_linear1",
        )(x)
        return nn.relu(
            nn.Dense(
                self.attribute_class_num,
                kernel_init=nn.initializers.normal(0.01),
                name="attr_linear2",
            )(x)
        )


class BertText(nn.Module):
    """BERT text path (reference unit.py:148-196
    forward_bert_with_task_idx): embeddings (+ optional task-embedding
    token), masked encoder, and the raw position-embedding table reused
    as the decoder's text positional signal."""

    cfg: TransformerConfig
    use_task_embedding: bool = False
    max_task_num: int = 256

    @nn.compact
    def __call__(self, input_ids, input_mask=None, segment_ids=None,
                 task_idx: Optional[int] = None, deterministic=True):
        cfg = self.cfg
        B, T = input_ids.shape
        if input_mask is None:
            input_mask = jnp.ones((B, T), jnp.int32)
        if segment_ids is None:
            segment_ids = jnp.zeros((B, T), jnp.int32)
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32, dtype=cfg.dtype, name="word_embeddings",
        )
        pos_table = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32, dtype=cfg.dtype,
            name="position_embeddings",
        )
        typ = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32, dtype=cfg.dtype,
            name="token_type_embeddings",
        )
        position_ids = jnp.arange(T)[None, :]
        from mmf_tpu.modules.transformer import apply_padding_idx

        x = apply_padding_idx(
            word(input_ids.astype(jnp.int32)), input_ids,
            getattr(cfg, "pad_token_id", 0),
        ) + pos_table(position_ids) + typ(segment_ids.astype(jnp.int32))
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="layer_norm",
        )(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic)

        start_idx = 0
        mask = input_mask
        if self.use_task_embedding:
            table = self.param(
                "task_embeddings_lang",
                nn.initializers.normal(cfg.initializer_range),
                (self.max_task_num, cfg.hidden_size),
            )
            tok = jnp.broadcast_to(
                table[task_idx][None, None], (B, 1, cfg.hidden_size)
            ).astype(x.dtype)
            x = jnp.concatenate([tok, x], axis=1)
            mask = jnp.concatenate([jnp.ones((B, 1), mask.dtype), mask], 1)
            start_idx = 1

        bias = make_attention_bias(mask, cfg.dtype)
        seq = TransformerEncoder(cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )
        seq = seq[:, start_idx:]
        text_pos = pos_table(position_ids)  # [1, T, H], shared table
        return seq, text_pos


# reference configs nest the DETR knobs under base_args
# (configs/models/unit/defaults.yaml:20-57); this maps them onto the
# flat keys this redesign reads (flat keys win when both are present)
_BASE_ARGS_MAP = {
    "enc_layers": "num_encoder_layers",
    "dec_layers": "num_decoder_layers",
    "nheads": "num_attention_heads",
    "encoder_hidden_dim": "hidden_size",
    "dim_feedforward": "intermediate_size",
    "dropout": "dropout",
    "pre_norm": "pre_norm",
    "pass_pos_and_query": "pass_pos_and_query",
    "residual_in_encoder": "residual_in_encoder",
    "use_task_embedding_in_img_encoder": "use_task_embedding_in_img_encoder",
    "use_task_embedding_in_lang_encoder":
        "use_task_embedding_in_lang_encoder",
    "set_cost_class": "cost_class",
    "set_cost_bbox": "cost_bbox",
    "set_cost_giou": "cost_giou",
    "bbox_loss_coef": "bbox_coef",
    "giou_loss_coef": "giou_coef",
    "attr_loss_coef": "attr_coef",
    "eos_coef": "eos_coef",
    "num_queries": "num_queries",
    "decoder_hidden_dim": "decoder_hidden_dim",
    "attribute_class_num": "attribute_class_num",
    "max_attribute_num": "max_attribute_num",
    "aux_loss": "aux_loss",
}


@registry.register_model("unit")
class UniT(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/unit/defaults.yaml"

    @classmethod
    def format_state_key(cls, key):
        # older mmbt-era checkpoints (reference unit.py:40-42)
        return key.replace("detr_model.", "unit_base_model.")

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
        if "bert_config" in ba and "bert_config" not in c:
            c["bert_config"] = ba["bert_config"]
        return c

    def _tcfg(self, c, hidden):
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

    def _bert_cfg(self, c):
        """Text-encoder config (reference builds a full BERT via
        base_args.bert_config, unit.py:74-76); sizes fall back to the
        DETR encoder sizes so tiny test configs stay tiny."""
        bc = dict(c.get("bert_config", {}) or {})
        hidden = bc.get("hidden_size", c.get("bert_hidden_size",
                                             c.get("hidden_size", 256)))
        return TransformerConfig.from_dict(
            {
                "hidden_size": hidden,
                "num_hidden_layers": bc.get(
                    "num_hidden_layers", c.get("bert_num_hidden_layers",
                                               c.get("num_encoder_layers", 6))
                ),
                "num_attention_heads": bc.get(
                    "num_attention_heads", c.get("num_attention_heads", 8)
                ),
                "intermediate_size": bc.get("intermediate_size", hidden * 4),
                "vocab_size": bc.get("vocab_size", c.get("vocab_size", 30522)),
                "hidden_dropout_prob": bc.get("hidden_dropout_prob", 0.1),
                "dtype": c.get("dtype", "float32"),
            }
        )

    def _task_cfg(self, c, task_type, dataset):
        """heads lookup supporting both the reference's nested layout
        (heads.{task}.{dataset}) and flat (heads.{dataset})."""
        heads = c.get("heads", {}) or {}
        by_task = heads.get(task_type, {}) or {}
        if isinstance(by_task, dict) and dataset in by_task:
            return dict(by_task.get(dataset) or {})
        if dataset in heads:
            return dict(heads.get(dataset) or {})
        return {}

    def _num_queries(self, c, task_type, dataset):
        nq = c.get("num_queries", 100)
        if isinstance(nq, int):
            return nq
        per_task = nq.get(task_type, {})
        if isinstance(per_task, int):
            return per_task
        return per_task.get(dataset, 100) or 100

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        c = self._merged_config()
        hidden = c.get("hidden_size", 256)
        dec_hidden = c.get("decoder_hidden_dim", hidden)
        dataset = sample_list.get("dataset_name", "detection_coco")
        dt = sample_list.get("dataset_type", "train")
        task_type = c.get("task_map", {}).get(
            dataset, c.get("default_task_type", "detection")
        )
        task_cfg = self._task_cfg(c, task_type, dataset)
        task_idx = int(task_cfg.get("task_idx", 0))
        num_queries = self._num_queries(c, task_type, dataset)

        img_src = img_mask = img_pos = None
        text_src = text_mask = text_pos = None

        if "image" in sample_list:
            feats = ResNet(
                depth=c.get("backbone_depth", 50), features_only=True,
                name="backbone",
            )(sample_list["image"], train)
            b, hh, ww, ch = feats.shape
            # 1x1 conv == per-token Dense (reference unit_base_model.py:37)
            img_src = nn.Dense(hidden, name="input_proj")(
                feats.reshape(b, hh * ww, ch)
            )
            img_pos = sine_position_embedding(hh, ww, hidden)[None]
            img_mask = jnp.ones((b, hh * ww), jnp.int32)
        elif "image_feature_0" in sample_list:
            # region-feature shortcut (TPU-side extension: the reference
            # only feeds raw images; features skip the backbone)
            img_src = nn.Dense(hidden, name="input_proj")(
                sample_list["image_feature_0"]
            )
            img_pos = jnp.zeros((1,) + img_src.shape[1:], img_src.dtype)
            img_mask = jnp.ones(img_src.shape[:2], jnp.int32)

        if task_type in ("vl", "glue") and "input_ids" in sample_list:
            bcfg = self._bert_cfg(c)
            seq, pos_tab = BertText(
                bcfg,
                use_task_embedding=c.get(
                    "use_task_embedding_in_lang_encoder", False
                ),
                name="bert_model",
            )(
                sample_list["input_ids"],
                sample_list.get("input_mask"),
                sample_list.get("segment_ids"),
                task_idx=task_idx,
                deterministic=deterministic,
            )
            # 768 -> decoder dim (reference unit.py:77-78, 208-210)
            text_src = nn.Dense(dec_hidden, name="bert_projection")(seq)
            text_pos = nn.Dense(dec_hidden, name="bert_pos_projection")(
                pos_tab
            )
            text_mask = sample_list.get(
                "input_mask", jnp.ones(text_src.shape[:2], jnp.int32)
            ).astype(jnp.int32)
            keep_cls = c.get("keep_only_bert_cls", {}) or {}
            keep_cls_task = keep_cls.get(task_type, {}) or {}
            if keep_cls_task.get(dataset, False):
                # (reference unit.py:212-216)
                text_src = text_src[:, 0:1]
                text_pos = text_pos[:, 0:1]
                text_mask = text_mask[:, 0:1]
            if task_type == "glue":
                img_src = img_mask = img_pos = None

        decoder_index = {task_type: [dataset]}
        core = UniTTransformerCore(
            d_model_enc=hidden,
            d_model_dec=dec_hidden,
            nheads=c.get("num_attention_heads", 8),
            dim_feedforward=c.get("intermediate_size", hidden * 4),
            num_encoder_layers=c.get("num_encoder_layers", 6),
            num_decoder_layers=c.get("num_decoder_layers", 6),
            dropout=c.get("dropout", 0.1),
            pre_norm=c.get("pre_norm", False),
            pass_pos_and_query=c.get("pass_pos_and_query", True),
            residual_in_encoder=c.get("residual_in_encoder", False),
            share_decoders=not c.get("separate_decoders", True),
            use_task_embedding_in_img_encoder=c.get(
                "use_task_embedding_in_img_encoder", False
            ),
            decoder_index=decoder_index,
            dtype=self._tcfg(c, hidden).dtype,
            name="unit_base_model",
        )
        query_key = ("shared" if not c.get("separate_decoders", True)
                     else f"{task_type}_{dataset}")
        query_embed = self.param(
            f"query_embed_{query_key}", nn.initializers.normal(1.0),
            (num_queries, dec_hidden),
        )
        hs, _ = core(
            img_src=img_src, img_mask=img_mask, img_pos=img_pos,
            text_src=text_src, text_mask=text_mask, text_pos=text_pos,
            query_embed=query_embed, task_type=task_type,
            dataset_name=dataset, task_idx=task_idx,
            deterministic=deterministic,
        )  # [L, B, Q, D]

        output: Dict[str, Any] = {}
        if task_type == "detection":
            num_classes = int(task_cfg.get(
                "num_classes", c.get("num_classes", 91)
            ))
            class_embed = nn.Dense(
                num_classes + 1, name=f"class_embed_{dataset}"
            )
            bbox_embed = BboxMLP(dec_hidden, name=f"bbox_embed_{dataset}")
            logits = class_embed(hs[-1])
            boxes = nn.sigmoid(bbox_embed(hs[-1]))
            output["scores"] = logits
            output["pred_logits"] = logits  # detection-report key
            output["pred_boxes"] = boxes

            attr_head = None
            if task_cfg.get("use_attr", False):
                attr_head = AttributeHead(
                    num_classes, c.get("attribute_class_num", 401),
                    name=f"attribute_head_{dataset}",
                )
                if c.get("predict_attributes", False):
                    top_cls = jnp.argmax(logits[..., :-1], axis=-1)
                    output["attr_logits"] = attr_head(hs[-1], top_cls)

            if dt != "test" and "labels" in sample_list and \
                    "boxes" in sample_list:
                losses = self._detection_losses(
                    c, logits, boxes, hs[-1], sample_list, num_classes,
                    attr_head,
                )
                # deep supervision: the same heads + Hungarian losses on
                # every intermediate decoder layer (reference
                # unit.py:247-250, unit_base_model.py:229-254)
                if c.get("aux_loss", True):
                    for li in range(hs.shape[0] - 1):
                        aux = self._detection_losses(
                            c, class_embed(hs[li]),
                            nn.sigmoid(bbox_embed(hs[li])), hs[li],
                            sample_list, num_classes, attr_head,
                        )
                        losses.update(
                            {f"{k}_{li}": v for k, v in aux.items()}
                        )
                output["losses"] = {
                    f"{dt}/{dataset}/{k}": v for k, v in losses.items()
                }
        else:
            num_labels = int(task_cfg.get(
                "num_labels", c.get("num_labels", 3129)
            ))
            # loss on the last hidden state only unless loss_on_all_hs
            # (reference unit.py:281-301)
            sup_hs = hs if c.get("loss_on_all_hs", False) else hs[-1:]
            clf_cfg = TransformerConfig.from_dict(
                {"hidden_size": dec_hidden,
                 "hidden_dropout_prob": c.get("dropout", 0.1),
                 "dtype": c.get("dtype", "float32")}
            )
            transform = PredictionHeadTransform(
                clf_cfg, name=f"clf_transform_{dataset}"
            )
            proj = nn.Dense(num_labels, name=f"clf_{dataset}")
            losses = {}
            scores = None
            for idx in range(sup_hs.shape[0]):
                # query 0 == hs[:, -num_queries] (reference unit.py:297)
                pooled = sup_hs[idx][:, 0]
                pooled = nn.Dropout(c.get("dropout", 0.1))(
                    pooled, deterministic
                )
                logits = proj(transform(pooled))
                scores = logits.reshape(-1, num_labels)
                if dt != "test" and "targets" in sample_list:
                    loss = self._classifier_loss(
                        c, task_cfg, scores, sample_list["targets"], dataset
                    )
                    losses[f"{dt}/{dataset}/loss_{idx}"] = loss
            output["scores"] = scores
            if losses:
                output["losses"] = losses
        return output

    def _classifier_loss(self, c, task_cfg, scores, targets, dataset):
        """(reference unit.py:300-312 + get_loss_fn)."""
        loss_type = task_cfg.get(
            "loss_type", "binary_cross_entropy_with_logits"
        )
        scores = scores.astype(jnp.float32)
        if loss_type == "cross_entropy":
            targets = targets.reshape(-1).astype(jnp.int32)
            lp = jax.nn.log_softmax(scores, axis=-1)
            return -jnp.mean(jnp.take_along_axis(
                lp, targets[:, None], axis=-1
            ))
        # binary_cross_entropy_with_logits, mean over all elements
        t = targets.astype(jnp.float32)
        per = jnp.maximum(scores, 0) - scores * t + jnp.log1p(
            jnp.exp(-jnp.abs(scores))
        )
        loss = jnp.mean(per)
        if dataset == "vqa2":
            # reference scales the mean-reduced BCE back up by the label
            # count (unit.py:309-310)
            loss = loss * t.shape[1]
        return loss

    def _detection_losses(self, c, logits, boxes, hs_last, sample_list,
                          num_classes, attr_head=None):
        """Hungarian-matched CE + L1 + GIoU (+ attribute) losses
        (reference unit_base_model.py SetCriterion)."""
        tgt_labels = sample_list["labels"]  # [B, T] padded with -1
        tgt_boxes = sample_list["boxes"]    # [B, T, 4] cxcywh
        num_targets = jnp.sum(tgt_labels >= 0, axis=1)

        matcher = HungarianMatcher(
            c.get("cost_class", 1.0),
            c.get("cost_bbox", 5.0),
            c.get("cost_giou", 2.0),
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
        weights = jnp.where(matched, 1.0, c.get("eos_coef", 0.1))
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
        out = {
            "detection_ce": loss_ce,
            "detection_bbox": loss_bbox * c.get("bbox_coef", 5.0),
            "detection_giou": loss_giou * c.get("giou_coef", 2.0),
        }
        if attr_head is not None and "attributes" in sample_list:
            out["detection_attr"] = self._attribute_loss(
                c, attr_head, hs_last, cls_target, safe_match, matched,
                sample_list["attributes"],
            ) * c.get("attr_coef", 1.0)
        return out

    def _attribute_loss(self, c, attr_head, hs_last, cls_target, safe_match,
                        matched, attributes):
        """(reference unit_base_model.py:375-424): multi-label attribute
        CE over matched queries, each box's loss normalized by its number
        of valid ground-truth attributes, averaged over boxes with at
        least one."""
        # attributes: [B, T, max_attr] padded with -1
        attr_logits = attr_head(hs_last, cls_target)  # [B, Q, C]
        B, Q, C = attr_logits.shape
        max_attr = attributes.shape[-1]
        # gather each query's matched target attributes; unmatched -> -1
        qattr = jnp.take_along_axis(
            attributes, safe_match[..., None], axis=1
        )
        qattr = jnp.where(matched[..., None], qattr, -1)  # [B, Q, max_attr]

        lp = jax.nn.log_softmax(attr_logits.astype(jnp.float32), axis=-1)
        valid = qattr >= 0
        safe_attr = jnp.where(valid, qattr, 0)
        ce = -jnp.take_along_axis(
            lp[:, :, None, :].repeat(max_attr, axis=2),
            safe_attr[..., None], axis=-1,
        )[..., 0] * valid
        n_valid = jnp.sum(valid, axis=-1)  # [B, Q]
        per_box = 0.5 * jnp.sum(ce, axis=-1) / jnp.maximum(n_valid, 1)
        has_attr = n_valid > 0
        n_boxes = jnp.maximum(jnp.sum(has_attr), 1)
        return jnp.sum(per_box * has_attr) / n_boxes
