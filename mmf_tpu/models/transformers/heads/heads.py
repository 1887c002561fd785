"""Registered transformer heads (parity with mmf/models/transformers/heads/):
mlm, mlm_multi, mlp (+multilayer_mlp), itm, mrc, mrfr, wra, contrastive,
refiner, refiner_classifier.

All heads take (sequence_output, processed_sample_list) and return
``{"scores": ...}`` and/or ``{"losses": {loss_name: scalar}}``. Dynamic
boolean indexing from the reference (``sequence_output[masked_tokens]``)
becomes fixed-shape masked reductions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.transformers.base import BaseTransformerHead
from mmf_tpu.modules.transformer import (
    ACT2FN,
    PredictionHeadTransform,
    Pooler,
    TransformerConfig,
)


def _cfg_from(config, **defaults):
    d = dict(defaults)
    d.update({k: v for k, v in (config or {}).items() if k in (
        "hidden_size", "vocab_size", "hidden_dropout_prob", "layer_norm_eps",
        "hidden_act",
    )})
    return TransformerConfig.from_dict(d)


def _masked_ce(logits, labels, ignore_index=-1):
    """Cross entropy over positions where labels != ignore_index; 0 if no
    valid positions (reference MLM NaN guard)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    lp = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.sum(valid)
    return jnp.where(
        denom > 0, -jnp.sum(jnp.where(valid, picked, 0.0)) / jnp.maximum(denom, 1),
        0.0,
    )


@registry.register_transformer_head("mlm")
class MLM(BaseTransformerHead):
    """(reference heads/mlm.py). ``shared_embedding`` ties the decoder to
    the caller's token-embedding table (reference BaseTransformerHead
    .tie_weights / mmf_transformer.py:145-174)."""

    config: Any = None
    ties_embeddings: bool = True

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True, shared_embedding=None):
        from mmf_tpu.modules.transformer import MLMHead

        c = self.config or {}
        tcfg = _cfg_from(c)
        label_key = c.get("label_key", None)
        if label_key is not None:
            masked_labels = processed_sample_list[label_key]
        else:
            masked_labels = processed_sample_list["mlm_labels"][
                "combined_labels"
            ]
        # when the model supplies hidden states encoded from the MASKED
        # ids (ViLT's second forward), those are what MLM must score
        sequence_output = processed_sample_list.get(
            "hs_masked_for_mlm", sequence_output
        )
        logits = MLMHead(tcfg, name="cls")(
            sequence_output, shared_embedding=shared_embedding
        )
        loss = _masked_ce(logits, masked_labels, c.get("ignore_index", -1))
        return {
            "logits": logits,
            "losses": {c.get("loss_name", "masked_lm_loss"): loss},
        }


@registry.register_transformer_head("mlm_multi")
class MLMForMultiHeads(BaseTransformerHead):
    config: Any = None
    ties_embeddings: bool = True

    @nn.compact
    def __call__(self, _, processed_sample_list=None, deterministic=True,
                 shared_embedding=None):
        return MLM(self.config, name="mlm_head")(
            processed_sample_list["hs_masked_for_mlm"],
            processed_sample_list=processed_sample_list,
            deterministic=deterministic,
            shared_embedding=shared_embedding,
        )


@registry.register_transformer_head("multilayer_mlp")
@registry.register_transformer_head("mlp")
class MLPHead(BaseTransformerHead):
    """(reference heads/mlp.py)"""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        c = self.config or {}
        num_labels = c.get("num_labels", 2)
        hidden_size = c.get("hidden_size", 768)
        in_dim = c.get("in_dim") or hidden_size
        num_layers = c.get("num_layers", 1)
        pooler_name = c.get("pooler_name", "bert_pooler")
        tcfg = _cfg_from(c, hidden_size=hidden_size)

        assert sequence_output.shape[-1] == in_dim, (
            "Mismatch between MLP head in_dim and sequence_output last dim"
        )
        if pooler_name == "bert_pooler":
            pooled = Pooler(
                TransformerConfig.from_dict({"hidden_size": in_dim}),
                name="pooler",
            )(sequence_output)
        elif pooler_name == "identity":
            pooled = sequence_output
        else:
            raise NotImplementedError(f"{pooler_name} is not implemented.")

        x = pooled
        for i in range(num_layers):
            x = nn.Dropout(c.get("hidden_dropout_prob", 0.1))(
                x, deterministic
            )
            x = nn.Dense(hidden_size, name=f"transform_dense_{i}")(x)
            # exact-erf GELU in f32 like the torch transform (ACT2FN
            # applies the repo-wide bf16 tanh policy)
            x = ACT2FN[c.get("hidden_act", "gelu")](x)
            x = nn.LayerNorm(
                epsilon=c.get("layer_norm_eps", 1e-6), name=f"transform_ln_{i}"
            )(x)
        logits = nn.Dense(num_labels, name="decoder")(x)
        return {"scores": logits.reshape(-1, num_labels)}


@registry.register_transformer_head("itm")
class ITM(BaseTransformerHead):
    """(reference heads/itm.py)"""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        c = self.config or {}
        tcfg = _cfg_from(c)
        label_key = c.get("itm_label_key", "is_correct")
        if label_key in processed_sample_list:
            labels = processed_sample_list[label_key]
        else:
            labels = processed_sample_list["itm_labels"][label_key]
        pooled = Pooler(tcfg, name="pooler")(sequence_output)
        logits = nn.Dense(2, name="seq_relationship")(pooled)
        loss = _masked_ce(
            logits.reshape(-1, 2), labels.reshape(-1),
            c.get("ignore_index", -1),
        )
        return {"losses": {c.get("loss_name", "itm_loss"): loss}}


@registry.register_transformer_head("mrc")
class MRC(BaseTransformerHead):
    """Masked region classification with KLD against detector class probs
    (reference heads/mrc.py)."""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        c = self.config or {}
        tcfg = _cfg_from(c)
        label_dict = processed_sample_list["mrc_labels"]
        targets = label_dict["targets"]        # [B, R, C] soft probs
        is_masked = label_dict["is_masked"]    # [B, R] bool
        use_image_fe = c.get("use_image_feature_embeddings", False)
        img_hidden = sequence_output[:, -targets.shape[1]:]
        x = PredictionHeadTransform(tcfg, name="transform")(img_hidden)
        logits = nn.Dense(targets.shape[-1], name="decoder")(x)
        lp = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = targets.astype(jnp.float32)
        kld = jnp.sum(
            jnp.where(tgt == 0, 0.0,
                      tgt * (jnp.log(jnp.where(tgt == 0, 1.0, tgt)) - lp)),
            axis=-1,
        )
        mask = is_masked.astype(jnp.float32)
        loss = jnp.sum(kld * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return {"losses": {c.get("loss_name", "mrc_loss"): loss}}


@registry.register_transformer_head("mrfr")
class MRFR(BaseTransformerHead):
    """Masked region feature regression (reference heads/mrfr.py).

    Known deviation: the reference ties its hidden->img_dim regression
    projection to the trunk's image-embedding weight
    (mrfr.py:41-49 linear_proj_weight); this head owns an independent
    decoder kernel. Same objective, slightly different parameterization
    — converted checkpoints fill the decoder from linear_proj_weight via
    the fuzzy name match."""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        c = self.config or {}
        tcfg = _cfg_from(c)
        label_dict = processed_sample_list["mrfr_labels"]
        targets = label_dict["targets"]        # [B, R, D] original features
        is_masked = label_dict["is_masked"]
        img_hidden = sequence_output[:, -targets.shape[1]:]
        x = PredictionHeadTransform(tcfg, name="transform")(img_hidden)
        pred = nn.Dense(targets.shape[-1], name="decoder")(x)
        se = jnp.sum((pred - targets) ** 2, axis=-1)
        mask = is_masked.astype(jnp.float32)
        loss = jnp.sum(se * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return {"losses": {c.get("loss_name", "mrfr_loss"): loss}}


@registry.register_transformer_head("wra")
class WRA(BaseTransformerHead):
    """Word-region alignment via optimal transport (reference heads/wra.py)."""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        from mmf_tpu.modules.ot import optimal_transport_dist

        c = self.config or {}
        label_dict = processed_sample_list["wra_info"]
        txt_len = label_dict["txt_len"]
        img_len = label_dict["img_len"]
        txt_pad = label_dict["txt_pad"].astype(bool)
        img_pad = label_dict["img_pad"].astype(bool)
        is_correct = label_dict["is_correct"]  # +1 aligned / -1 misaligned

        T = txt_pad.shape[1]
        txt_emb = sequence_output[:, :T]
        img_emb = sequence_output[:, T:T + img_pad.shape[1]]
        dist = optimal_transport_dist(txt_emb, img_emb, txt_pad, img_pad)
        sign = is_correct.astype(jnp.float32) * 2 - 1 \
            if is_correct.dtype != jnp.float32 else is_correct
        loss = jnp.mean(dist * sign)
        return {"losses": {c.get("loss_name", "wra_loss"): loss}}


@registry.register_transformer_head("contrastive_three_way")
@registry.register_transformer_head("contrastive")
class ContrastiveHead(BaseTransformerHead):
    """Three-way contrastive (itc-style) head (reference heads/contrastive.py)."""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        c = self.config or {}
        tcfg = _cfg_from(c)
        labels = processed_sample_list["contrastive_labels"]
        pooled = Pooler(tcfg, name="pooler")(sequence_output)
        logits = nn.Dense(c.get("num_labels", 3), name="decoder")(pooled)
        loss = _masked_ce(logits, labels, c.get("ignore_index", -1))
        return {"losses": {c.get("loss_name", "three_way_contrastive_loss"): loss}}


@registry.register_transformer_head("refiner")
class Refiner(BaseTransformerHead):
    """Fusion refiner: decode the fused embedding back toward modality
    embeddings (reference heads/refiner.py)."""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        c = self.config or {}
        hidden_size = c.get("hidden_size", 768)
        tcfg = _cfg_from(c, hidden_size=hidden_size)
        modalities = c.get("modalities", ["text", "image"])

        pooled = Pooler(tcfg, name="pooler")(sequence_output)
        fused = nn.Dense(hidden_size, name="fusion")(pooled)

        # per-modality targets: the masked mean of each modality's token
        # SPAN (reference refiner.py:116-143 — spans come from the
        # per-modality masks, concatenated in modality order). Without
        # masks every decoder would regress the same whole-sequence mean
        # and the per-modality losses would be redundant.
        masks = None
        if processed_sample_list is not None:
            masks = processed_sample_list.get("masks", None)
        losses = {}
        start = 0
        for m in modalities:
            dec = nn.Dense(hidden_size, name=f"decoder_{m}")(fused)
            if masks is not None and m in masks:
                mask = masks[m].astype(sequence_output.dtype)
                span = sequence_output[:, start: start + mask.shape[1]]
                denom = jnp.maximum(
                    jnp.sum(mask, axis=1, keepdims=True), 1.0
                )
                target = jnp.sum(span * mask[..., None], axis=1) / denom
                start += mask.shape[1]
            else:
                target = sequence_output.mean(axis=1)
            losses[f"refiner_{m}_loss"] = jnp.mean((dec - target) ** 2)
        out = {"fused_embedding": fused, "losses": losses}
        return out


@registry.register_transformer_head("refiner_classifier")
@registry.register_transformer_head("refnet_classifier")
class RefinerClassifier(BaseTransformerHead):
    """Refiner + MLP classifier combo (reference heads/refnet_classifier.py)."""

    config: Any = None

    @nn.compact
    def __call__(self, sequence_output, processed_sample_list=None,
                 deterministic=True):
        c = dict(self.config or {})
        refiner_out = Refiner(c.get("refiner_config", c), name="refiner")(
            sequence_output, processed_sample_list, deterministic
        )
        mlp_out = MLPHead(c.get("mlp_config", c), name="mlp")(
            sequence_output, processed_sample_list, deterministic
        )
        out = {
            "scores": mlp_out["scores"],
            "fused_embedding": refiner_out["fused_embedding"],
        }
        out["losses"] = refiner_out.get("losses", {})
        return out
