"""BAN: bilinear attention networks (parity with mmf/models/ban.py:96)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.embeddings import BiLSTMTextEmbedding
from mmf_tpu.modules.layers import (
    BCNet,
    BiAttention,
    FCNet,
    WeightNormClassifier,
)


@registry.register_model("ban")
class BAN(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/ban/defaults.yaml"

    def _dataset(self):
        cfg = registry.get("config", no_warning=True)
        if cfg is not None and cfg.get("datasets", None):
            d = cfg["datasets"]
            return (d.split(",") if isinstance(d, str) else list(d))[0]
        return "vqa2"

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        c = self.config
        te = c["text_embedding"]
        ba = c["bilinear_attention"]
        num_hidden = te["num_hidden"]
        gamma = ba["gamma"]

        vocab_size = registry.get(
            self._dataset() + "_text_vocab_size", no_warning=True
        ) or c.get("text_vocab_size", 100000)
        num_choices = registry.get(
            self._dataset() + "_num_final_outputs", no_warning=True
        ) or c.get("num_labels", 3129)

        v = sample_list["image_feature_0"]
        q = nn.Embed(vocab_size, 300, name="word_embedding")(
            sample_list["text"].astype(jnp.int32)
        )
        q_emb = BiLSTMTextEmbedding(
            num_hidden, te["emb_size"], te.get("num_layers", 1),
            te.get("dropout", 0.0), te.get("bidirectional", False),
            te.get("rnn_type", "GRU"), name="q_emb",
        )(q, forward_all=True)

        att, _ = BiAttention(num_hidden, gamma, name="v_att")(
            v, q_emb, deterministic=deterministic
        )
        for g in range(gamma):
            g_att = att[:, g]
            b_emb = BCNet(
                num_hidden, None, k=ba.get("bc_net", {}).get("k", 1),
                name=f"b_net_{g}",
            )(v, q_emb, deterministic, w=g_att)
            proj = FCNet(
                (num_hidden, num_hidden),
                act=ba.get("fc_net", {}).get("activation", "ReLU"),
                dropout=ba.get("fc_net", {}).get("dropout", 0.0),
                name=f"q_prj_{g}",
            )(b_emb[:, None], deterministic)
            q_emb = proj + q_emb

        logits = WeightNormClassifier(
            num_choices, num_hidden * 2, c["classifier"].get("dropout", 0.5),
            name="classifier",
        )(q_emb.sum(axis=1), deterministic)
        return {"scores": logits}
