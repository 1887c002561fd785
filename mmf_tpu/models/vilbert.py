"""ViLBERT: two-stream transformer with co-attention bridges.

TPU-native reimplementation of the reference (mmf/models/vilbert.py, 1472
lines): a text stream (BERT-base) and an image stream (v_hidden 1024, 6
layers) run in parallel, bridged at configured depths
(``t_biattention_id``/``v_biattention_id``) by BertConnectionLayer whose
BertBiAttention computes BOTH cross directions (text-queries x image-keys
and image-queries x text-keys) through the shared attention kernel.

The interleave schedule is static config, so it unrolls into straight-line
XLA; ``fixed_t/v_layer`` no-grad prefixes become stop_gradient. Supports
``dynamic_attention`` gates and pretraining (masked LM + masked image KLD)
and classification heads. nlvr2 batches are pre-doubled like VisualBERT.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.transformer import (
    ACT2FN,
    PredictionHeadTransform,
    TextEmbeddings,
    TransformerConfig,
    _dense,
)
from mmf_tpu.ops.attention import dot_product_attention, make_attention_bias


def _cdtype(c):
    """Compute dtype for the two-stream stack. Params stay float32; a
    ``dtype: bfloat16`` config key switches activations/gemms to bf16
    (same policy as modules/transformer.py)."""
    d = c.get("dtype", None) if hasattr(c, "get") else None
    if d in ("bfloat16", "bf16") or d is jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


def _vdense(c, features, name):
    return nn.Dense(features, name=name, dtype=_cdtype(c),
                    param_dtype=jnp.float32)


def _vln(c, name):
    return nn.LayerNorm(epsilon=1e-12, name=name, dtype=_cdtype(c),
                        param_dtype=jnp.float32)


def _split_heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class ImageSelfAttention(nn.Module):
    """Image-stream self-attention with optional text-conditioned dynamic
    gating (reference vilbert.py:153-249)."""

    cfg: Any  # vilbert config node

    @nn.compact
    def __call__(self, hidden, bias, txt_embedding, txt_attention_mask,
                 deterministic=True):
        c = self.cfg
        v_hidden = c["v_hidden_size"]
        h = c["v_num_attention_heads"]
        q = _vdense(c, v_hidden, "query")(hidden)
        k = _vdense(c, v_hidden, "key")(hidden)
        v = _vdense(c, v_hidden, "value")(hidden)

        if c.get("dynamic_attention", False):
            m = txt_attention_mask.astype(txt_embedding.dtype)[..., None]
            pool = jnp.sum(txt_embedding * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
            gate_q = 1 + nn.sigmoid(_vdense(c, v_hidden, "dyLinear_q")(pool))
            gate_k = 1 + nn.sigmoid(_vdense(c, v_hidden, "dyLinear_k")(pool))
            q = q * gate_q[:, None, :]
            k = k * gate_k[:, None, :]

        rate = 0.0 if deterministic else c.get(
            "v_attention_probs_dropout_prob", 0.1
        )
        ctx = dot_product_attention(
            _split_heads(q, h), _split_heads(k, h), _split_heads(v, h), bias,
            dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
            train=not deterministic,
        )
        return _merge_heads(ctx)


class ImageLayer(nn.Module):
    """Image-stream transformer layer (reference vilbert.py:313-345)."""

    cfg: Any

    @nn.compact
    def __call__(self, hidden, bias, txt_embedding, txt_attention_mask,
                 deterministic=True):
        c = self.cfg
        v_hidden = c["v_hidden_size"]
        att = ImageSelfAttention(c, name="attention_self")(
            hidden, bias, txt_embedding, txt_attention_mask, deterministic
        )
        att = _vdense(c, v_hidden, "attention_output_dense")(att)
        att = nn.Dropout(c.get("v_hidden_dropout_prob", 0.1))(att, deterministic)
        hidden = _vln(c, "attention_ln")(att + hidden)

        inter = _vdense(c, c["v_intermediate_size"], "intermediate_dense")(
            hidden
        )
        inter = ACT2FN[c.get("v_hidden_act", "gelu")](inter)
        out = _vdense(c, v_hidden, "output_dense")(inter)
        out = nn.Dropout(c.get("v_hidden_dropout_prob", 0.1))(out, deterministic)
        return _vln(c, "output_ln")(out + hidden)


class TextLayer(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, hidden, bias, deterministic=True):
        c = self.cfg
        hsz = c["hidden_size"]
        h = c["num_attention_heads"]
        q = _vdense(c, hsz, "query")(hidden)
        k = _vdense(c, hsz, "key")(hidden)
        v = _vdense(c, hsz, "value")(hidden)
        rate = 0.0 if deterministic else c.get(
            "attention_probs_dropout_prob", 0.1
        )
        ctx = dot_product_attention(
            _split_heads(q, h), _split_heads(k, h), _split_heads(v, h), bias,
            dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
            train=not deterministic,
        )
        att = _vdense(c, hsz, "attention_output_dense")(_merge_heads(ctx))
        att = nn.Dropout(c.get("hidden_dropout_prob", 0.1))(att, deterministic)
        hidden = _vln(c, "attention_ln")(att + hidden)

        inter = ACT2FN[c.get("hidden_act", "gelu")](
            _vdense(c, c["intermediate_size"], "intermediate_dense")(hidden)
        )
        out = _vdense(c, hsz, "output_dense")(inter)
        out = nn.Dropout(c.get("hidden_dropout_prob", 0.1))(out, deterministic)
        return _vln(c, "output_ln")(out + hidden)


class ConnectionLayer(nn.Module):
    """Bi-attention bridge + per-stream FFNs
    (reference vilbert.py:347-558). One module computes both cross
    directions: text-q x image-kv and image-q x text-kv."""

    cfg: Any

    @nn.compact
    def __call__(self, v_hidden, v_bias, t_hidden, t_bias, deterministic=True):
        c = self.cfg
        bi = c["bi_hidden_size"]
        h = c["bi_num_attention_heads"]

        q1 = _vdense(c, bi, "query1")(v_hidden)
        k1 = _vdense(c, bi, "key1")(v_hidden)
        va1 = _vdense(c, bi, "value1")(v_hidden)
        q2 = _vdense(c, bi, "query2")(t_hidden)
        k2 = _vdense(c, bi, "key2")(t_hidden)
        va2 = _vdense(c, bi, "value2")(t_hidden)

        # probs dropout per direction (reference BertBiAttention dropout1/
        # dropout2, vilbert.py:347-475)
        rate1 = 0.0 if deterministic else c.get(
            "v_attention_probs_dropout_prob", 0.1
        )
        rate2 = 0.0 if deterministic else c.get(
            "attention_probs_dropout_prob", 0.1
        )
        # text queries attend image keys/values (context for text)
        ctx1 = dot_product_attention(
            _split_heads(q2, h), _split_heads(k1, h), _split_heads(va1, h),
            v_bias,
            dropout_rate=rate1,
            dropout_rng=self.make_rng("dropout") if rate1 > 0.0 else None,
            train=not deterministic,
        )
        # image queries attend text keys/values (context for image)
        ctx2 = dot_product_attention(
            _split_heads(q1, h), _split_heads(k2, h), _split_heads(va2, h),
            t_bias,
            dropout_rate=rate2,
            dropout_rng=self.make_rng("dropout") if rate2 > 0.0 else None,
            train=not deterministic,
        )
        ctx1 = _merge_heads(ctx1)  # [B, T_text, bi]
        ctx2 = _merge_heads(ctx2)  # [B, T_img, bi]

        # BiOutput (reference naming: dense1 consumes ctx2->image stream)
        v_ctx = _vdense(c, c["v_hidden_size"], "biout_dense1")(ctx2)
        v_ctx = nn.Dropout(c.get("v_hidden_dropout_prob", 0.1))(
            v_ctx, deterministic
        )
        v_att = _vln(c, "biout_ln1")(v_ctx + v_hidden)

        t_ctx = _vdense(c, c["hidden_size"], "biout_dense2")(ctx1)
        t_ctx = nn.Dropout(c.get("hidden_dropout_prob", 0.1))(
            t_ctx, deterministic
        )
        t_att = _vln(c, "biout_ln2")(t_ctx + t_hidden)

        # per-stream FFNs
        v_int = ACT2FN[c.get("v_hidden_act", "gelu")](
            _vdense(c, c["v_intermediate_size"], "v_intermediate")(v_att)
        )
        v_out = _vdense(c, c["v_hidden_size"], "v_output")(v_int)
        v_out = nn.Dropout(c.get("v_hidden_dropout_prob", 0.1))(
            v_out, deterministic
        )
        v_final = _vln(c, "v_output_ln")(v_out + v_att)

        t_int = ACT2FN[c.get("hidden_act", "gelu")](
            _vdense(c, c["intermediate_size"], "t_intermediate")(t_att)
        )
        t_out = _vdense(c, c["hidden_size"], "t_output")(t_int)
        t_out = nn.Dropout(c.get("hidden_dropout_prob", 0.1))(
            t_out, deterministic
        )
        t_final = _vln(c, "t_output_ln")(t_out + t_att)

        return v_final, t_final


class ViLBertBase(nn.Module):
    """Two-stream encoder with the reference's interleave schedule
    (vilbert.py:559-798, 916-1053)."""

    cfg: Any

    @nn.compact
    def __call__(self, input_ids, image_feature, image_location,
                 token_type_ids, attention_mask, image_attention_mask,
                 deterministic=True):
        c = self.cfg
        tcfg = TransformerConfig.from_dict(
            {
                k: c.get(k)
                for k in ("vocab_size", "hidden_size", "num_attention_heads",
                          "intermediate_size", "hidden_dropout_prob",
                          "max_position_embeddings", "type_vocab_size",
                          "dtype")
                if c.get(k) is not None
            }
        )

        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if image_attention_mask is None:
            image_attention_mask = jnp.ones(image_feature.shape[:2],
                                            input_ids.dtype)

        t_bias = make_attention_bias(attention_mask, _cdtype(c))
        v_bias = make_attention_bias(image_attention_mask, _cdtype(c))

        # embeddings
        txt = TextEmbeddings(tcfg, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic
        )
        img = _vdense(c, c["v_hidden_size"], "v_image_embeddings")(
            image_feature
        ) + _vdense(c, c["v_hidden_size"], "v_location_embeddings")(
            image_location
        )
        img = _vln(c, "v_embeddings_ln")(img)
        img = nn.Dropout(c.get("hidden_dropout_prob", 0.1))(img, deterministic)

        t_layers = [
            TextLayer(c, name=f"layer_{i}")
            for i in range(c["num_hidden_layers"])
        ]
        v_layers = [
            ImageLayer(c, name=f"v_layer_{i}")
            for i in range(c["v_num_hidden_layers"])
        ]
        v_bi_ids = list(c["v_biattention_id"])
        t_bi_ids = list(c["t_biattention_id"])
        c_layers = [
            ConnectionLayer(c, name=f"c_layer_{i}")
            for i in range(len(v_bi_ids))
        ]
        fixed_t = c.get("fixed_t_layer", 0)
        fixed_v = c.get("fixed_v_layer", 0)
        with_coattention = c.get("with_coattention", True)

        v_start, t_start = 0, 0
        for count, (v_end, t_end) in enumerate(zip(v_bi_ids, t_bi_ids)):
            assert fixed_t <= t_end and fixed_v <= v_end
            for idx in range(t_start, t_end):
                out = t_layers[idx](txt, t_bias, deterministic)
                txt = jax.lax.stop_gradient(out) if idx < fixed_t else out
            for idx in range(v_start, v_end):
                out = v_layers[idx](
                    img, v_bias, txt, attention_mask, deterministic
                )
                img = jax.lax.stop_gradient(out) if idx < fixed_v else out
            if with_coattention:
                img, txt = c_layers[count](
                    img, v_bias, txt, t_bias, deterministic
                )
            v_start, t_start = v_end, t_end

        for idx in range(v_start, c["v_num_hidden_layers"]):
            img = v_layers[idx](img, v_bias, txt, attention_mask, deterministic)
        for idx in range(t_start, c["num_hidden_layers"]):
            txt = t_layers[idx](txt, t_bias, deterministic)

        # poolers: project CLS / first region into bi_hidden; the reference
        # uses ReLU here, not BERT's usual tanh (vilbert.py:799-825)
        pooled_t = nn.relu(
            _vdense(c, c["bi_hidden_size"], "t_pooler")(txt[:, 0])
        )
        pooled_v = nn.relu(
            _vdense(c, c["bi_hidden_size"], "v_pooler")(img[:, 0])
        )
        return txt, img, pooled_t, pooled_v


@registry.register_model("vilbert")
class ViLBERT(BaseModel):

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        mmf/models/vilbert.py:1420-1421: get_optimizer_parameters_for_bert /
        get_bert_configured_parameters)."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/vilbert/pretrain.yaml"

    @classmethod
    def format_state_key(cls, key: str) -> str:
        return key.replace("bert.bert", "model.bert")

    def _get_image_and_text_features(self, sample_list):
        head = self.config.get("training_head_type", "classification")
        input_ids = sample_list["input_ids"]
        input_mask = sample_list["input_mask"]
        segment_ids = sample_list.get("segment_ids",
                                      jnp.zeros_like(input_ids))
        if head == "nlvr2":
            input_ids = jnp.concatenate([input_ids, input_ids], 0)
            input_mask = jnp.concatenate([input_mask, input_mask], 0)
            segment_ids = jnp.concatenate([segment_ids, segment_ids], 0)
            feats = jnp.concatenate(
                [sample_list["img0"]["image_feature_0"],
                 sample_list["img1"]["image_feature_0"]], 0)
            dims = jnp.concatenate(
                [sample_list["img0"]["image_info_0"]["max_features"],
                 sample_list["img1"]["image_info_0"]["max_features"]], 0)
            locs = jnp.concatenate(
                [sample_list["img0"]["image_info_0"]["bbox"],
                 sample_list["img1"]["image_info_0"]["bbox"]], 0)
            image_target = None
        else:
            feats = sample_list["image_feature_0"]
            info = sample_list.get("image_info_0", {})
            dims = info.get("max_features",
                            jnp.full((feats.shape[0],), feats.shape[1]))
            locs = info.get("bbox", jnp.zeros(feats.shape[:2] + (5,)))
            image_target = info.get("cls_prob", None)
        image_mask = (
            jnp.arange(feats.shape[1])[None, :] < dims.reshape(-1, 1)
        ).astype(input_mask.dtype)
        return {
            "input_ids": input_ids,
            "attention_mask": input_mask,
            "token_type_ids": segment_ids,
            "image_feature": feats,
            "image_location": locs,
            "image_attention_mask": image_mask,
            "image_target": image_target,
            "masked_lm_labels": sample_list.get("lm_label_ids", None),
            "image_label": sample_list.get("image_labels", None),
        }

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        c = self.config
        head = c.get("training_head_type", "classification")
        deterministic = not train
        inp = self._get_image_and_text_features(sample_list)

        txt, img, pooled_t, pooled_v = ViLBertBase(c, name="bert")(
            inp["input_ids"], inp["image_feature"], inp["image_location"],
            inp["token_type_ids"], inp["attention_mask"],
            inp["image_attention_mask"], deterministic,
        )

        tcfg = TransformerConfig.from_dict(
            {"vocab_size": c.get("vocab_size", 30522),
             "hidden_size": c.get("hidden_size", 768),
             "dtype": c.get("dtype", "float32")}
        )
        output: Dict[str, Any] = {}
        ds = sample_list.get("dataset_name", "unknown")
        dt = sample_list.get("dataset_type", "train")

        if head == "pretraining":
            from mmf_tpu.modules.transformer import MLMHead

            losses = {}
            # text MLM over hidden_size -> vocab
            t_logits = MLMHead(tcfg, name="cls_text")(txt)
            labels = inp["masked_lm_labels"]
            if labels is not None:
                valid = labels != -1
                safe = jnp.where(valid, labels, 0).astype(jnp.int32)
                lp = nn.log_softmax(t_logits.astype(jnp.float32), -1)
                picked = jnp.take_along_axis(lp, safe[..., None], -1)[..., 0]
                losses[f"{dt}/{ds}/masked_lm_loss"] = -jnp.sum(
                    jnp.where(valid, picked, 0.0)
                ) / jnp.maximum(jnp.sum(valid), 1)
            # masked image region KLD against detector class probs
            v_trans = nn.Dense(
                c.get("v_hidden_size", 1024), name="img_head_transform"
            )(img)
            v_trans = ACT2FN["gelu"](v_trans)
            v_trans = nn.LayerNorm(epsilon=1e-12, name="img_head_ln")(v_trans)
            v_logits = nn.Dense(
                c.get("v_target_size", 1601), name="img_head_decoder"
            )(v_trans)
            image_target = inp["image_target"]
            image_label = inp["image_label"]
            if image_target is not None and image_label is not None:
                # visual_target selects the masked-region objective
                # (reference vilbert.py:1072-1077,1138-1229):
                #   0 -> KLD vs detector class probs (default)
                #   1 -> MSE on region features
                #   2 -> NCE vs sampled negative regions
                visual_target = int(c.get("visual_target", 0))
                tgt = image_target.astype(jnp.float32)
                mask = (image_label == 1).astype(jnp.float32)[..., None]
                if visual_target == 0:
                    lp = nn.log_softmax(v_logits.astype(jnp.float32), -1)
                    kld = jnp.sum(
                        jnp.where(
                            tgt == 0, 0.0,
                            tgt * (jnp.log(jnp.where(tgt == 0, 1.0, tgt))
                                   - lp)),
                        axis=2, keepdims=True,
                    )
                    losses[f"{dt}/{ds}/masked_img_loss"] = jnp.sum(
                        kld * mask
                    ) / jnp.maximum(jnp.sum(mask), 1.0)
                elif visual_target == 1:
                    sq = (v_logits.astype(jnp.float32) - tgt) ** 2
                    # normalizer counts every masked ELEMENT (reference
                    # expands the mask over the feature dim)
                    losses[f"{dt}/{ds}/masked_img_loss"] = jnp.sum(
                        sq * mask
                    ) / jnp.maximum(
                        jnp.sum(mask) * jnp.float32(sq.shape[-1]), 1.0
                    )
                elif visual_target == 2:
                    # NCE: positive region target vs num_negative sampled
                    # regions, 70% across the batch / 30% inside the
                    # image, scored by dot product; CE with the positive
                    # at index 0, masked-mean over predicted regions
                    nneg = int(c.get("num_negative", 128))
                    n_across = int(nneg * 0.7)
                    n_inside = int(nneg * 0.3)
                    bsz, nreg = v_logits.shape[0], v_logits.shape[1]
                    rng = (self.make_rng("sampling")
                           if self.has_rng("sampling")
                           else jax.random.PRNGKey(0))
                    r1, r2, r3 = jax.random.split(rng, 3)
                    row_across = jax.random.randint(
                        r1, (bsz, nreg, n_across), 0, max(bsz - 1, 1)
                    )
                    row_across = jnp.where(
                        row_across == jnp.arange(bsz)[:, None, None],
                        bsz - 1, row_across,
                    )
                    col_across = jax.random.randint(
                        r2, (bsz, nreg, n_across), 0, nreg
                    )
                    idx_across = row_across * nreg + col_across
                    col_inside = jax.random.randint(
                        r3, (bsz, nreg, n_inside), 0, max(nreg - 1, 1)
                    )
                    col_inside = jnp.where(
                        col_inside == jnp.arange(nreg)[None, :, None],
                        nreg - 1, col_inside,
                    )
                    idx_inside = (
                        jnp.arange(bsz)[:, None, None] * nreg + col_inside
                    )
                    final_index = jnp.concatenate(
                        [idx_across, idx_inside], axis=2
                    )
                    flat_tgt = tgt.reshape(bsz * nreg, -1)
                    negative_v = flat_tgt[final_index]  # [B,R,nn,D]
                    sample_v = jnp.concatenate(
                        [tgt[:, :, None], negative_v], axis=2
                    )
                    score = jnp.einsum(
                        "brnd,brd->brn", sample_v,
                        v_logits.astype(jnp.float32),
                    )
                    lp0 = nn.log_softmax(score, axis=-1)[..., 0]
                    m2 = (image_label == 1).astype(jnp.float32)
                    losses[f"{dt}/{ds}/masked_img_loss"] = -jnp.sum(
                        lp0 * m2
                    ) / jnp.maximum(jnp.sum(m2), 1.0)
                else:
                    raise AssertionError(
                        f"unknown visual_target {visual_target}"
                    )
            # ITM score over the fused pooled pair (reference
            # vilbert.py:877-885: sum or mul fusion + dropout; the ITM
            # loss is commented out in the reference, so only the score
            # is produced — the head's weights stay convertible)
            fusion = c.get("fusion_method", "mul")
            fused = (pooled_t + pooled_v) if fusion == "sum" \
                else (pooled_t * pooled_v)
            fused = nn.Dropout(0.1)(fused, deterministic)
            seq_rel = nn.Dense(2, name="bi_seq_relationship")(fused)
            output["seq_relationship_score"] = seq_rel
            output["scores"] = t_logits.reshape(
                -1, c.get("vocab_size", 30522)
            )
            output["losses"] = losses
        else:
            fusion = c.get("fusion_method", "mul")
            if fusion == "sum":
                pooled = pooled_t + pooled_v
            elif fusion == "mul":
                pooled = pooled_t * pooled_v
            else:
                raise AssertionError(fusion)
            pooled = nn.Dropout(c.get("hidden_dropout_prob", 0.1))(
                pooled, deterministic
            )
            if head == "nlvr2":
                # the batch was doubled BLOCK-wise ([all img0; all img1]),
                # so pair by halves — reshape(-1, 2H) would concatenate
                # img0 of sample i with img0 of sample i+1
                b = pooled.shape[0]
                pooled = jnp.concatenate(
                    [pooled[: b // 2], pooled[b // 2:]], axis=1
                )
            clf_cfg = TransformerConfig.from_dict(
                {"hidden_size": pooled.shape[-1],
                 "dtype": c.get("dtype", "float32")}
            )
            x = PredictionHeadTransform(clf_cfg, name="classifier_transform")(
                pooled
            )
            num_labels = c.get("num_labels", 2)
            logits = nn.Dense(num_labels, name="classifier_logits")(x)
            output["scores"] = logits.reshape(-1, num_labels).astype(
                jnp.float32
            )
        return output
