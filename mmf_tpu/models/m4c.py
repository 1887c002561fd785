"""M4C: multimodal transformer with pointer network for TextVQA.

TPU-native reimplementation of the reference (mmf/models/m4c.py:573):
TextBert (3L) encodes the question; object and OCR branches project
Faster-R-CNN fc7 + FastText(300) + PHOC(604) + bbox features; the MMT
joint transformer runs over [txt, obj, ocr, dec] with a prefix-LM mask
(causal only on the decode span); outputs = fixed-vocab classifier scores
concatenated with OcrPtrNet dynamic copy scores.

Decoding: the reference greedy-decodes with 12 SEPARATE full forwards,
one python dispatch each (m4c.py:284-304, noted in SURVEY §3.4). Here the
12 steps unroll inside ONE jit — module params are shared across steps
(linen instance reuse), XLA pipelines the whole decode, and there is a
single device dispatch per batch.

Cross-layer contract preserved: reads ``{dataset}_num_final_outputs`` and
``{dataset}_answer_processor`` from the registry (reference m4c.py:159-170).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.transformer import (
    TextEmbeddings,
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import DEFAULT_MASK_VALUE


# Measured decode cost anchors at TextVQA shapes, B=32, TPU v5e
# (tools/benchmarks/prof_m4c_decode.py; BENCH_NOTES.md "M4C decode" +
# "M4C decode unroll, round 5"): unroll -> (compile seconds,
# samples/second). Only the two non-dominated points are listed:
# throughput saturates at unroll 8 (8 and 12 both measure ~2182
# samples/s, so 12 is pure extra compile), and 1/2/6 are dominated by 4.
# Compile seconds are the quiet-session scale (unroll-4 = 74 s); the
# 8/4 compile ratio (1.25x) is the same-session measured ratio —
# absolute compile over the tunnel varies by hundreds of seconds with
# remote-compile-service load, ratios are what the policy needs. The
# full-recompute reference loop (m4c.py:284-304) measures 297 s / 650
# samples/s.
_DECODE_COST = {
    4: (74.0, 1574.0),
    8: (93.0, 2182.0),
}
# budget assumed when the caller gives none: one eval pass over TextVQA
# val (~5k samples) per the reference's textvqa defaults
_DEFAULT_DECODE_BUDGET = 5000


def _resolve_decode_unroll(budget_samples: int) -> int:
    """Pick the nn.scan unroll factor minimizing estimated total time
    (one compile + ``budget_samples`` decoded) over the measured cost
    table. VERDICT r4 #7: unroll is chosen from the run shape instead of
    a fixed default; ``model_config.m4c.decode_unroll`` (an int) still
    overrides.

    When the persistent XLA compilation cache is on
    (env.compilation_cache_dir / MMF_COMPILATION_CACHE_DIR,
    utils/env.py:setup_compilation_cache), the compile is paid once
    across ALL future runs, so steady-state throughput wins outright.
    """
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return max(_DECODE_COST, key=lambda u: _DECODE_COST[u][1])
    budget = int(budget_samples) or _DEFAULT_DECODE_BUDGET
    return min(
        _DECODE_COST,
        key=lambda u: _DECODE_COST[u][0] + budget / _DECODE_COST[u][1],
    )


def _get_mask(nums, max_num):
    return (
        jnp.arange(max_num)[None, :] < nums.reshape(-1, 1)
    ).astype(jnp.float32)


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class TextBert(nn.Module):
    """Question encoder (reference m4c.py:350-372)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, txt_inds, txt_mask, deterministic=True):
        x = TextEmbeddings(self.cfg, name="embeddings")(
            txt_inds, deterministic=deterministic
        )
        bias = ((1.0 - txt_mask) * -10000.0)[:, None, None, :]
        return TransformerEncoder(self.cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )


class PrevPredEmbeddings(nn.Module):
    """Decode-step input embeddings from previous predictions
    (reference m4c.py:493-539)."""

    cfg: TransformerConfig
    MAX_DEC_LENGTH: int = 100
    MAX_TYPE_NUM: int = 5

    @nn.compact
    def __call__(self, ans_emb, ocr_emb, prev_inds, deterministic=True):
        hidden = self.cfg.hidden_size
        eps = self.cfg.layer_norm_eps
        B, T = prev_inds.shape
        ans_num = ans_emb.shape[0]

        ans_emb = nn.LayerNorm(epsilon=eps, name="ans_layer_norm")(ans_emb)
        ocr_emb = nn.LayerNorm(epsilon=eps, name="ocr_layer_norm")(ocr_emb)
        ans_b = jnp.broadcast_to(ans_emb[None], (B,) + ans_emb.shape)
        cat = jnp.concatenate([ans_b, ocr_emb], axis=1)  # [B, V+O, H]
        raw_dec = jnp.take_along_axis(
            cat, prev_inds[..., None].astype(jnp.int32), axis=1
        )

        pos = nn.Embed(self.MAX_DEC_LENGTH, hidden,
                       name="position_embeddings")(jnp.arange(T)[None, :])
        token_type = (prev_inds >= ans_num).astype(jnp.int32)
        typ = nn.Embed(self.MAX_TYPE_NUM, hidden,
                       name="token_type_embeddings")(token_type)
        emb = nn.LayerNorm(epsilon=eps, name="emb_layer_norm")(pos + typ)
        emb = nn.Dropout(self.cfg.hidden_dropout_prob)(emb, deterministic)
        return raw_dec + emb


class MMT(nn.Module):
    """Joint transformer over [txt, obj, ocr, dec] with prefix-LM mask
    (reference m4c.py:375-456)."""

    cfg: TransformerConfig

    def setup(self):
        self.prev_pred_embeddings = PrevPredEmbeddings(self.cfg)
        self.encoder = TransformerEncoder(self.cfg)

    def __call__(self, txt_emb, txt_mask, obj_emb, obj_mask, ocr_emb,
                 ocr_mask, fixed_ans_emb, prev_inds, deterministic=True):
        dec_emb = self.prev_pred_embeddings(
            fixed_ans_emb, ocr_emb, prev_inds, deterministic
        )
        dec_max_num = dec_emb.shape[1]
        dec_mask = jnp.zeros(dec_emb.shape[:2], jnp.float32)

        encoder_inputs = jnp.concatenate(
            [txt_emb, obj_emb, ocr_emb, dec_emb], axis=1
        )
        attention_mask = jnp.concatenate(
            [txt_mask, obj_mask, ocr_mask, dec_mask], axis=1
        )
        S = attention_mask.shape[1]

        # prefix-LM extended mask: everyone sees encoding tokens; decode
        # span is causal
        ext = jnp.broadcast_to(
            attention_mask[:, None, None, :],
            (attention_mask.shape[0], 1, S, S),
        )
        causal = jnp.tril(jnp.ones((dec_max_num, dec_max_num), jnp.float32))
        ext = ext.at[:, :, -dec_max_num:, -dec_max_num:].set(
            causal[None, None]
        )
        bias = ((1.0 - ext) * -10000.0).astype(self.cfg.dtype)

        seq = self.encoder(encoder_inputs, bias=bias,
                           deterministic=deterministic)

        txt_max = txt_mask.shape[-1]
        obj_max = obj_mask.shape[-1]
        ocr_max = ocr_mask.shape[-1]
        return {
            "mmt_seq_output": seq,
            "mmt_txt_output": seq[:, :txt_max],
            "mmt_ocr_output": seq[:, txt_max + obj_max:
                                  txt_max + obj_max + ocr_max],
            "mmt_dec_output": seq[:, -dec_max_num:],
        }

    def prefill(self, txt_emb, txt_mask, obj_emb, obj_mask, ocr_emb,
                ocr_mask, deterministic=True):
        """Encode the decode-invariant [txt, obj, ocr] prefix ONCE.

        In the prefix-LM mask, prefix queries never see decode keys
        (their mask entries are 0), so prefix hidden states — and hence
        each layer's K/V projections of prefix tokens — are identical on
        every greedy-decode step. Returns (prefix seq output, per-layer
        prefix K/V cache, prefix mask) for ``decode_step``. Numerically
        identical to the prefix rows of a full pass: the -10000 bias on
        decode keys underflows to exactly 0 weight after the softmax
        max-subtraction."""
        enc_in = jnp.concatenate([txt_emb, obj_emb, ocr_emb], axis=1)
        enc_mask = jnp.concatenate([txt_mask, obj_mask, ocr_mask], axis=1)
        bias = ((1.0 - enc_mask[:, None, None, :]) * -10000.0).astype(
            self.cfg.dtype
        )
        seq, kvs = self.encoder(
            enc_in, bias=bias, deterministic=deterministic, return_kv=True
        )
        return seq, kvs, enc_mask

    def decode_step(self, prefix_kvs, enc_mask, fixed_ans_emb, ocr_emb,
                    prev_inds, deterministic=True):
        """One greedy-decode pass over ONLY the decode tokens: each layer
        attends over [cached prefix K/V ; causal decode K/V]. Per-step
        compute drops from O(S_prefix + S_dec) tokens to O(S_dec)."""
        dec_emb = self.prev_pred_embeddings(
            fixed_ans_emb, ocr_emb, prev_inds, deterministic
        )
        B, T = dec_emb.shape[:2]
        enc_part = jnp.broadcast_to(
            enc_mask[:, None, None, :].astype(jnp.float32),
            (B, 1, T, enc_mask.shape[-1]),
        )
        causal = jnp.broadcast_to(
            jnp.tril(jnp.ones((T, T), jnp.float32))[None, None],
            (B, 1, T, T),
        )
        bias = ((1.0 - jnp.concatenate([enc_part, causal], -1))
                * -10000.0).astype(self.cfg.dtype)
        return self.encoder(
            dec_emb, bias=bias, deterministic=deterministic,
            prefix_kvs=prefix_kvs,
        )


class OcrPtrNet(nn.Module):
    """Dynamic pointer scores over OCR tokens (reference m4c.py:459-490)."""

    hidden_size: int
    query_key_size: Optional[int] = None

    @nn.compact
    def __call__(self, query_inputs, key_inputs, attention_mask):
        qk = self.query_key_size or self.hidden_size
        ext_mask = ((1.0 - attention_mask) * -10000.0)[:, None, :]
        q = nn.Dense(qk, name="query")(query_inputs)
        k = nn.Dense(qk, name="key")(key_inputs)
        scores = jnp.einsum("btq,bsq->bts", q, k) / jnp.sqrt(float(qk))
        return scores + ext_mask


@registry.register_model("m4c")
class M4C(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/m4c/defaults.yaml"

    def get_lr_multipliers(self, config=None):
        c = self.config
        return {
            "text_bert": c.get("lr_scale_text_bert", 0.1),
            "obj_faster_rcnn_fc7": c.get("lr_scale_frcn", 0.1),
            "ocr_faster_rcnn_fc7": c.get("lr_scale_frcn", 0.1),
            "mmt": c.get("lr_scale_mmt", 1.0),
        }

    @staticmethod
    def _bert_cfg_from(section, defaults):
        """BertConfig(**section) analog (reference m4c.py:39,72): every
        recognized key flows through — dropping e.g. the dropout probs
        would silently train with the 0.1 defaults."""
        cfg = dict(defaults)
        for key in (
            "vocab_size", "hidden_size", "num_hidden_layers",
            "num_attention_heads", "intermediate_size",
            "hidden_dropout_prob", "attention_probs_dropout_prob",
            "max_position_embeddings", "type_vocab_size", "hidden_act",
            "layer_norm_eps", "initializer_range", "dtype", "quant",
        ):
            if key in section:
                cfg[key] = section[key]
        cfg.setdefault(
            "intermediate_size", cfg.get("hidden_size", 768) * 4
        )
        return TransformerConfig.from_dict(cfg)

    def _mmt_cfg(self):
        mmt = dict(self.config.get("mmt", {}) or {})
        mmt.setdefault("dtype", self.config.get("dtype", "float32"))
        mmt.setdefault("quant", self.config.get("quant", "none"))
        return self._bert_cfg_from(
            mmt, {"hidden_size": 768, "num_hidden_layers": 4,
                  "num_attention_heads": 12}
        )

    def _text_cfg(self):
        tb = dict(self.config.get("text_bert", {}) or {})
        tb.setdefault("dtype", self.config.get("dtype", "float32"))
        tb.setdefault("quant", self.config.get("quant", "none"))
        return self._bert_cfg_from(
            tb, {"vocab_size": 30522, "hidden_size": 768,
                 "num_hidden_layers": 3, "num_attention_heads": 12}
        )

    def setup(self):
        # setup-defined (not compact-inline) so the eval decode scan can
        # reach them through the module passed to nn.scan
        mmt_cfg = self._mmt_cfg()
        self.mmt = MMT(mmt_cfg)
        self.ocr_ptr_net = OcrPtrNet(
            hidden_size=mmt_cfg.hidden_size,
            query_key_size=self.config["classifier"]["ocr_ptr_net"].get(
                "query_key_size", None
            ),
        )

    def _finalize_scores(self, scores):
        """Per-step score hook (reference m4c.py _forward_output); the
        captioner subclass masks <unk> here so the greedy feedback chain
        never emits it (m4c_captioner.py:16-23)."""
        return scores

    def _num_choices(self):
        datasets = self.config.get("datasets", None) or registry.get(
            "config", no_warning=True
        ) and (registry.get("config")["datasets"])
        if isinstance(datasets, str):
            dataset = datasets.split(",")[0].strip()
        elif isinstance(datasets, (list, tuple)) and datasets:
            dataset = datasets[0]
        else:
            dataset = "textvqa"
        num = registry.get(f"{dataset}_num_final_outputs", no_warning=True)
        if num is None:
            num = self.config.get("num_final_outputs", 5050)
        return num - self.config["classifier"]["ocr_max_num"]

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        c = self.config
        deterministic = not train
        mmt_cfg = self._mmt_cfg()
        text_cfg = self._text_cfg()
        hidden = mmt_cfg.hidden_size

        # ---- shared modules -------------------------------------------------
        # mmt/ocr_ptr_net are instantiated inside one_pass (below) so the
        # eval path can run it under nn.scan; text_bert runs once per
        # forward and stays here
        text_bert = TextBert(text_cfg, name="text_bert")
        num_choices = self._num_choices()
        classifier_w = self.param(
            "classifier_w", nn.initializers.normal(0.02),
            (num_choices, hidden),
        )
        classifier_b = self.param(
            "classifier_b", nn.initializers.zeros, (num_choices,)
        )

        from mmf_tpu.modules.embeddings import ImageFinetune

        obj_fc7_enc = ImageFinetune(
            c["obj"].get("mmt_in_dim", 2048), out_dim_hint=2048,
            name="obj_faster_rcnn_fc7",
        )
        ocr_fc7_enc = ImageFinetune(2048, out_dim_hint=2048,
                                    name="ocr_faster_rcnn_fc7")

        # ---- text encoding ----------------------------------------------
        txt_inds = sample_list["text"]
        txt_mask = _get_mask(sample_list["text_len"], txt_inds.shape[1])
        txt_emb = text_bert(txt_inds, txt_mask, deterministic)
        if text_cfg.hidden_size != hidden:
            txt_emb = nn.Dense(hidden, name="text_bert_out_linear")(txt_emb)

        # ---- obj branch ----------------------------------------------------
        obj_fc6 = sample_list["image_feature_0"]
        obj_fc7 = _normalize(obj_fc7_enc(obj_fc6))
        obj_bbox = sample_list["obj_bbox_coordinates"]
        obj_mmt_in = nn.LayerNorm(epsilon=1e-5, name="obj_feat_layer_norm")(
            nn.Dense(hidden, name="linear_obj_feat_to_mmt_in")(obj_fc7)
        ) + nn.LayerNorm(epsilon=1e-5, name="obj_bbox_layer_norm")(
            nn.Dense(hidden, name="linear_obj_bbox_to_mmt_in")(obj_bbox)
        )
        obj_mmt_in = nn.Dropout(c["obj"].get("dropout_prob", 0.1))(
            obj_mmt_in, deterministic
        )
        obj_nums = sample_list["image_info_0"]["max_features"]
        obj_mask = _get_mask(obj_nums, obj_mmt_in.shape[1])

        # ---- ocr branch ----------------------------------------------------
        ocr_fasttext = _normalize(sample_list["context_feature_0"])
        ocr_phoc = _normalize(sample_list["context_feature_1"])
        assert ocr_fasttext.shape[-1] == 300
        assert ocr_phoc.shape[-1] == 604
        ocr_fc6 = sample_list["image_feature_1"][:, : ocr_fasttext.shape[1], :]
        ocr_fc7 = _normalize(ocr_fc7_enc(ocr_fc6))
        order_vectors = jnp.zeros_like(sample_list["order_vectors"])

        if c["ocr"].get("remove_ocr_fasttext", False):
            ocr_fasttext = jnp.zeros_like(ocr_fasttext)
        if c["ocr"].get("remove_ocr_phoc", False):
            ocr_phoc = jnp.zeros_like(ocr_phoc)
        if c["ocr"].get("remove_ocr_frcn", False):
            ocr_fc7 = jnp.zeros_like(ocr_fc7)
        ocr_feat = jnp.concatenate(
            [ocr_fasttext, ocr_phoc, ocr_fc7, order_vectors], axis=-1
        )
        ocr_bbox = sample_list["ocr_bbox_coordinates"]
        if c["ocr"].get("remove_ocr_semantics", False):
            ocr_feat = jnp.zeros_like(ocr_feat)
        if c["ocr"].get("remove_ocr_bbox", False):
            ocr_bbox = jnp.zeros_like(ocr_bbox)
        ocr_mmt_in = nn.LayerNorm(epsilon=1e-5, name="ocr_feat_layer_norm")(
            nn.Dense(hidden, name="linear_ocr_feat_to_mmt_in")(ocr_feat)
        ) + nn.LayerNorm(epsilon=1e-5, name="ocr_bbox_layer_norm")(
            nn.Dense(hidden, name="linear_ocr_bbox_to_mmt_in")(ocr_bbox)
        )
        ocr_mmt_in = nn.Dropout(c["ocr"].get("dropout_prob", 0.1))(
            ocr_mmt_in, deterministic
        )
        ocr_nums = sample_list["context_info_0"]["max_features"]
        ocr_mask = _get_mask(ocr_nums, ocr_mmt_in.shape[1])

        # ---- mmt + output ---------------------------------------------------
        train_prev_inds = sample_list["train_prev_inds"].astype(jnp.int32)
        if train:
            res = self.mmt(
                txt_emb, txt_mask, obj_mmt_in, obj_mask, ocr_mmt_in,
                ocr_mask, classifier_w, train_prev_inds, deterministic,
            )
            dec = res["mmt_dec_output"]
            fixed_scores = dec @ classifier_w.T + classifier_b
            dyn = self.ocr_ptr_net(dec, res["mmt_ocr_output"], ocr_mask)
            scores = self._finalize_scores(
                jnp.concatenate([fixed_scores, dyn], axis=-1)
            )
        else:
            # Incremental greedy decode (SURVEY §3.4 and then some): the
            # reference recomputes the FULL joint transformer on all 12
            # decode steps (m4c.py:284-304). Here the decode-invariant
            # [txt,obj,ocr] prefix is encoded once with its per-layer K/V
            # cached (see MMT.prefill), and nn.scan pushes only the
            # decode tokens through the stack per step — one compiled
            # body, ~S_dec/S_total of the per-step FLOPs, identical
            # numerics. Carry = (feedback indices, last scores).
            dec_step_num = train_prev_inds.shape[1]
            bos_idx = int(self.config.get("bos_idx", 1))
            prev_inds = jnp.zeros_like(train_prev_inds)
            prev_inds = prev_inds.at[:, 0].set(bos_idx)

            enc_seq, prefix_kvs, enc_mask = self.mmt.prefill(
                txt_emb, txt_mask, obj_mmt_in, obj_mask, ocr_mmt_in,
                ocr_mask, deterministic,
            )
            txt_max = txt_mask.shape[-1]
            obj_max = obj_mask.shape[-1]
            ocr_out = enc_seq[
                :, txt_max + obj_max: txt_max + obj_max + ocr_mask.shape[-1]
            ]

            def decode_step(mdl, carry, _):
                inds, _ = carry
                dec = mdl.mmt.decode_step(
                    prefix_kvs, enc_mask, classifier_w, ocr_mmt_in, inds,
                    deterministic,
                )
                fixed_scores = dec @ classifier_w.T + classifier_b
                dyn = mdl.ocr_ptr_net(dec, ocr_out, ocr_mask)
                s = mdl._finalize_scores(jnp.concatenate(
                    [fixed_scores, dyn], axis=-1
                ).astype(jnp.float32))
                argmax_inds = jnp.argmax(s, axis=-1).astype(jnp.int32)
                new_inds = inds.at[:, 1:].set(argmax_inds[:, :-1])
                return (new_inds, s), None

            scores_shape = (
                train_prev_inds.shape[0],
                dec_step_num,
                num_choices + ocr_mask.shape[-1],
            )
            # scan-iteration overhead (~1.9 ms/iter through this stack)
            # dwarfs the now-tiny per-step compute, so partial unroll
            # wins both axes vs r1's full recompute (cost anchors in
            # _DECODE_COST above). Default "auto" picks the unroll that
            # minimizes compile + decode time for the run's expected
            # decode budget (decode_budget_samples, injected by the
            # trainer from max_updates/evaluation_interval and val-set
            # size); an int decode_unroll pins it.
            unroll_cfg = self.config.get("decode_unroll", "auto")
            if isinstance(unroll_cfg, str) and unroll_cfg == "auto":
                unroll = _resolve_decode_unroll(
                    self.config.get("decode_budget_samples", 0)
                )
            else:
                unroll = int(unroll_cfg)
            scan = nn.scan(
                decode_step,
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": False},
                length=dec_step_num,
                unroll=min(unroll, dec_step_num),
            )
            (_, scores), _ = scan(
                self,
                (prev_inds, jnp.zeros(scores_shape, jnp.float32)),
                None,
            )

        return {"scores": scores}
