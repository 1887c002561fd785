"""MoVie+MCAN: grid-feature MCAN with MoVie counting branch
(parity with mmf/models/movie_mcan.py:274)."""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.embeddings import SAEmbedding, TwoBranchEmbedding
from mmf_tpu.modules.layers import BranchCombineLayer, TripleLinear


@registry.register_model("movie_mcan")
class MoVieMcan(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/movie_mcan/defaults.yaml"

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
        te = c["text_embeddings"]["params"]
        fe = c["image_feature_embeddings"]["params"]
        dtype = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}.get(
            str(c.get("dtype", "float32")), jnp.float32
        )

        vocab_size = registry.get(
            self._dataset() + "_text_vocab_size", no_warning=True
        ) or c.get("text_vocab_size", 100000)
        num_choices = registry.get(
            self._dataset() + "_num_final_outputs", no_warning=True
        ) or c.get("num_labels", 3129)

        text_ids = sample_list["text"].astype(jnp.int32)
        texts = nn.Embed(vocab_size, 300, name="word_embedding")(text_ids)
        # True where padding (reference movie_mcan.py:258
        # ``sample_list.text_mask = sample_list.text.eq(0)``)
        text_mask = sample_list.get("text_mask", None)
        if text_mask is None:
            text_mask = text_ids == 0

        text_total, text_vec = SAEmbedding(
            te["hidden_dim"], te.get("embedding_dim", 300),
            num_attn=te.get("num_attn", 8),
            num_layers=te.get("num_layers", 6),
            dropout=te.get("dropout", 0.1),
            num_attn_pool=te.get("num_attn_pool", 1),
            num_feat=te.get("num_feat", 2),
            dtype=dtype,
            name="text_embeddings",
        )(texts, text_mask, deterministic)

        # grid features: [B, C, H, W] from image or flattened features
        if "image" in sample_list:
            feature = sample_list["image"]
            enc_cfg = c.get("image_feature_encodings", None)
            if enc_cfg is not None and feature.ndim == 4 and (
                feature.shape[1] == 3 or feature.shape[-1] == 3
            ):
                # raw images: run the configured grid encoder (reference
                # movie_mcan.py:70-84 _init_feature_encoders) and fold
                # the [B, N, D] tokens back onto their square grid
                from mmf_tpu.modules.encoders import build_image_encoder

                if isinstance(enc_cfg, (list, tuple)):
                    enc_cfg = enc_cfg[0]
                encoder = build_image_encoder(
                    dict(enc_cfg), direct_features=False
                )
                tokens = encoder(feature, train)
                b, n, d = tokens.shape
                side = int(round(float(n) ** 0.5))
                feature = tokens[:, : side * side].transpose(0, 2, 1)
                feature = feature.reshape(b, d, side, side)
        else:
            feature = sample_list["image_feature_0"]
            if feature.ndim == 3:  # [B, K, C] -> [B, C, k, k]
                b, k, ch = feature.shape
                side = int(k ** 0.5)
                feature = feature[:, : side * side].transpose(0, 2, 1)
                feature = feature.reshape(b, ch, side, side)

        # pooled text vector 0 conditions the MoVie branch; vector 1 is
        # the question arm of the combine layer (reference
        # movie_mcan.py:263-270 — vec[:, 0] and vec[:, 1])
        x_sga, x_cbn = TwoBranchEmbedding(
            embedding_dim=feature.shape[1],
            cond_dim=fe.get("cond_dim", te["hidden_dim"]),
            hidden_dim=fe.get("hidden_dim", 512),
            num_attn=fe.get("num_attn", 8),
            num_layers=fe.get("num_layers", 6),
            dropout=fe.get("dropout", 0.1),
            cbn_num_layers=fe.get("cbn_num_layers", 4),
            dtype=dtype,
            name="image_feature_embeddings_list",
        )(feature, text_total, text_vec[:, 0], None, text_mask,
          deterministic)

        joint = BranchCombineLayer(
            x_sga.shape[-1], text_vec.shape[-1],
            name="combine_layer",
        )(x_sga.astype(jnp.float32), x_cbn.astype(jnp.float32),
          text_vec[:, 1].astype(jnp.float32), train)

        scores = TripleLinear(num_choices, name="classifier")(joint, train)
        return {"scores": scores}
