"""Pythia (VQA 2018 winner) family: pythia, pythia_question_only,
pythia_image_only, multihead.

TPU-native reimplementation of the reference (mmf/models/pythia.py:19-501):
GloVe+LSTM+conv-attention text embedding, top-down image-feature attention
over (fc7-finetuned) region features, element-multiply fusion, two-branch
logit classifier. In flax the dimension bookkeeping the reference does at
build time disappears — Dense layers infer input dims at trace time.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.embeddings import (
    ImageFeatureEmbedding,
    MultiHeadImageFeatureEmbedding,
    TextEmbedding,
)
from mmf_tpu.modules.layers import ClassifierLayer, ModalCombineLayer
from mmf_tpu.modules.encoders import build_image_encoder


@registry.register_model("pythia")
class Pythia(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/pythia/defaults.yaml"

    @classmethod
    def format_state_key(cls, key):
        return key.replace("fa_history", "fa_context")

    def _datasets(self) -> List[str]:
        cfg = registry.get("config", no_warning=True)
        if cfg is not None and cfg.get("datasets", None):
            d = cfg["datasets"]
            return d.split(",") if isinstance(d, str) else list(d)
        return [self.config.get("datasets", "vqa2")]

    def _num_choices(self):
        num = registry.get(
            self._datasets()[0] + "_num_final_outputs", no_warning=True
        )
        return num if num is not None else self.config.get("num_labels", 3129)

    def _vocab_size(self):
        tp = registry.get(
            self._datasets()[0] + "_text_processor", no_warning=True
        )
        if tp is not None and hasattr(tp, "get_vocab_size"):
            return tp.get_vocab_size()
        return self.config.get("text_vocab_size", 100000)

    def _word_embedding(self, texts):
        return nn.Embed(
            self._vocab_size(), 300, name="word_embedding"
        )(texts.astype(jnp.int32))

    def _text_embedding_total(self, texts, deterministic):
        embeds = []
        for i, te_cfg in enumerate(self.config["text_embeddings"]):
            emb = TextEmbedding(
                te_cfg["type"], te_cfg.get("params", {}),
                name=f"text_embeddings_{i}",
            )(texts, deterministic=deterministic)
            embeds.append(emb)
        return jnp.concatenate(embeds, axis=1)

    def _feature_embedding_total(self, attr, sample_list, text_total,
                                 deterministic, extra=None):
        feature_embeddings = []
        attentions = []
        encodings = self.config[f"{attr}_feature_encodings"]
        for i, enc_cfg in enumerate(encodings):
            feature = sample_list.get(f"{attr}_feature_{i}", None)
            if feature is None:
                break
            info = sample_list.get(f"{attr}_info_{i}", {}) or {}
            feature_dim = info.get("max_features", None)
            if feature_dim is None:
                feature_dim = jnp.full((feature.shape[0],), feature.shape[1])
            encoder = build_image_encoder(dict(enc_cfg), direct_features=True)
            encoded = encoder(feature)
            for j, fe_cfg in enumerate(self.config[f"{attr}_feature_embeddings"]):
                emb, attn = ImageFeatureEmbedding(
                    encoded.shape[-1], 0,
                    modal_combine=fe_cfg["modal_combine"],
                    transform=fe_cfg["transform"],
                    normalization=fe_cfg.get("normalization", "softmax"),
                    name=f"{attr}_feature_embeddings_{i}_{j}",
                )(encoded, text_total, feature_dim, extra, deterministic)
                feature_embeddings.append(emb)
                attentions.append(attn)
        return jnp.concatenate(feature_embeddings, axis=1), attentions

    def _combine(self, image_total, text_total, deterministic):
        cc = self.config["image_text_modal_combine"]
        return ModalCombineLayer(
            cc["type"], 0, 0, cc.get("params", {}),
            name="image_text_multi_modal_combine_layer",
        )(image_total, text_total, deterministic=deterministic)

    def _classify(self, joint, deterministic):
        cc = self.config["classifier"]
        return ClassifierLayer(
            cc["type"], 0, self._num_choices(), params=cc.get("params", {}),
            name="classifier",
        )(joint, deterministic)

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        texts = self._word_embedding(sample_list["text"])
        text_total = self._text_embedding_total(texts, deterministic)
        image_total, _ = self._feature_embedding_total(
            "image", sample_list, text_total, deterministic
        )
        joint = self._combine(image_total, text_total, deterministic)
        scores = self._classify(joint, deterministic)
        return {"scores": scores}


@registry.register_model("pythia_question_only")
class PythiaQuestionOnly(Pythia):
    """Text-branch-only ablation (reference pythia.py:310-332): the text
    embedding is zeroed, routed through the combine layer's ``fa_txt`` arm
    alone, and scored by the classifier's ``linear_text(f_o_text(.))``
    branch alone — NOT the full combine/classifier on zeroed inputs."""

    config: Any = None

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        deterministic = not train
        texts = self._word_embedding(sample_list["text"])
        text_total = self._text_embedding_total(texts, deterministic)
        text_total = jnp.zeros_like(text_total)
        cc = self.config["image_text_modal_combine"]
        joint = ModalCombineLayer(
            cc["type"], 0, 0, cc.get("params", {}),
            name="image_text_multi_modal_combine_layer",
        )(text_total, text_total, deterministic=deterministic, branch="text")
        ccl = self.config["classifier"]
        scores = ClassifierLayer(
            ccl["type"], 0, self._num_choices(), params=ccl.get("params", {}),
            name="classifier",
        )(joint, deterministic, branch="text")
        return {"scores": scores}


@registry.register_model("pythia_image_only")
class PythiaImageOnly(Pythia):
    """Image-branch ablation (reference pythia.py:336-361): image features
    attended with a zeroed text embedding, routed through the combine
    layer's ``fa_image`` arm alone, then the full logit classifier."""

    config: Any = None

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        deterministic = not train
        texts = self._word_embedding(sample_list["text"])
        text_total = self._text_embedding_total(texts, deterministic)
        text_total = jnp.zeros_like(text_total)
        image_total, _ = self._feature_embedding_total(
            "image", sample_list, text_total, deterministic
        )
        cc = self.config["image_text_modal_combine"]
        joint = ModalCombineLayer(
            cc["type"], 0, 0, cc.get("params", {}),
            name="image_text_multi_modal_combine_layer",
        )(image_total, image_total, deterministic=deterministic,
          branch="image")
        scores = self._classify(joint, deterministic)
        return {"scores": scores}


@registry.register_model("multihead")
class PythiaMultiHead(Pythia):
    """Pythia with multi-head image-feature attention
    (reference pythia.py:404-501)."""

    config: Any = None

    def _feature_embedding_total(self, attr, sample_list, text_total,
                                 deterministic, extra=None):
        feature_embeddings = []
        encodings = self.config[f"{attr}_feature_encodings"]
        for i, enc_cfg in enumerate(encodings):
            feature = sample_list.get(f"{attr}_feature_{i}", None)
            if feature is None:
                break
            info = sample_list.get(f"{attr}_info_{i}", {}) or {}
            feature_dim = info.get("max_features", None)
            encoder = build_image_encoder(dict(enc_cfg), direct_features=True)
            encoded = encoder(feature)
            for j, fe_cfg in enumerate(
                self.config[f"{attr}_feature_embeddings"]
            ):
                emb, _ = MultiHeadImageFeatureEmbedding(
                    encoded.shape[-1], text_total.shape[-1],
                    num_heads=fe_cfg.get("num_heads", 8),
                    name=f"{attr}_feature_embeddings_{i}_{j}",
                )(encoded, text_total, feature_dim, extra, deterministic)
                feature_embeddings.append(emb)
        return jnp.concatenate(feature_embeddings, axis=1), []
