"""Image-text alignment/retrieval models: cm_shared_transformer
(parity with mmf/models/alignment.py:106-253).

Text and image encodings are projected and passed through a SHARED
transformer layer, attention-pooled per modality, and compared with
in-batch contrastive objectives (scores=image emb, targets=text emb —
the retrieval metrics/losses contract).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.layers import AttnPool1d
from mmf_tpu.modules.transformer import TransformerConfig, TransformerLayer
from mmf_tpu.modules.encoders import build_image_encoder, build_text_encoder
from mmf_tpu.ops.attention import make_attention_bias


@registry.register_model("cm_shared_transformer")
class CMSharedTransformer(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/alignment/defaults.yaml"

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        alignment.py:148-150 bert-groups the text encoder). Applied
        model-wide here — the reference keeps the image backbone's
        bias/LN decayed in its plain group; documented simplification."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        c = self.config
        final_dim = c.get("final_hidden_size", 512)
        # reference alignment.py:138-140 hardcodes
        # torch.nn.TransformerEncoderLayer(final_hidden_size, 4, 2048,
        # dropout=0.1, activation="relu"): 4 heads, 2048 FFN, relu, and
        # torch's LayerNorm default eps 1e-5
        tcfg = TransformerConfig.from_dict(
            {
                "hidden_size": final_dim,
                "num_attention_heads": c.get("num_attention_heads", 4),
                "intermediate_size": c.get("intermediate_size", 2048),
                "hidden_act": c.get("hidden_act", "relu"),
                "layer_norm_eps": c.get("layer_norm_eps", 1e-5),
                "dtype": c.get("dtype", "float32"),
                "quant": c.get("quant", "none"),
            }
        )

        # text branch; eval retrieval batches stack `factor` captions per
        # image along a leading axis — flatten so texts count B*factor
        input_ids = sample_list["input_ids"]
        input_mask = sample_list.get("input_mask")
        segment_ids = sample_list.get("segment_ids")
        if input_ids.ndim == 3:
            input_ids = input_ids.reshape(-1, input_ids.shape[-1])
            if input_mask is not None and input_mask.ndim == 3:
                input_mask = input_mask.reshape(-1, input_mask.shape[-1])
            if segment_ids is not None and segment_ids.ndim == 3:
                segment_ids = segment_ids.reshape(-1, segment_ids.shape[-1])
        text_enc = build_text_encoder(
            c.get("text_encoder", {"type": "transformer", "params": {}})
        )
        text_seq = text_enc(
            input_ids, input_mask,
            segment_ids, deterministic=deterministic,
            return_sequence=True,
        )
        tproj_dim = (c.get("text_projection", {}) or {}).get(
            "params", {}
        ).get("out_dim", final_dim)
        text_proj = nn.Dense(tproj_dim, name="text_projection")(text_seq)

        # image branch (reference key: image_encoder; with
        # direct_features_input the features arrive precomputed)
        enc_cfg = c.get("image_encoder", c.get("modal_encoder"))
        if c.get("direct_features_input", False) or (
            "image" not in sample_list and "image_feature_0" in sample_list
        ):
            image_feats = sample_list["image_feature_0"]
        else:
            image_enc = build_image_encoder(
                enc_cfg or {"type": "resnet152", "params": {}}
            )
            image_feats = image_enc(sample_list["image"], not deterministic)
        proj_dim = (c.get("image_projection", {}) or {}).get(
            "params", {}
        ).get("out_dim", final_dim)
        image_proj = nn.Dense(proj_dim, name="image_projection")(image_feats)

        # sine position embedding on the image grid (reference
        # alignment.py:24-72 PositionEmbeddingSine over the 7x7 feature
        # map) when the token count is a square grid
        k = image_proj.shape[1]
        side = int(round(float(k) ** 0.5))
        if side * side == k:
            from mmf_tpu.models.unit.unit import sine_position_embedding

            pos = sine_position_embedding(side, side, final_dim)
            image_proj = image_proj + pos[None].astype(image_proj.dtype)

        # shared transformer stack over each modality separately
        # (reference alignment.py:138-143: 2-layer TransformerEncoder)
        num_shared = c.get("num_shared_layers", 2)
        text_bias = None
        if input_mask is not None:
            text_bias = make_attention_bias(input_mask, tcfg.dtype)
        text_out, image_out = text_proj, image_proj
        for i in range(num_shared):
            shared = TransformerLayer(tcfg, name=f"shared_transformer_{i}")
            text_out = shared(text_out, bias=text_bias,
                              deterministic=deterministic)
            image_out = shared(image_out, deterministic=deterministic)

        # text pooling masks padded tokens (reference alignment.py:240
        # passes mask.eq(0) into text_pool); the image grid has no pads
        text_pad = (input_mask == 0) if input_mask is not None else None
        text_pooled = AttnPool1d(final_dim, 1, name="text_pool")(
            text_out, text_out, mask=text_pad, deterministic=deterministic
        )[:, 0]
        image_pooled = AttnPool1d(final_dim, 1, name="image_pool")(
            image_out, image_out, deterministic=deterministic
        )[:, 0]

        # normalization is per-modality configurable (reference defaults:
        # text yes, image no — alignment.py:207-209,241-242)
        if c.get("norm_text_embeddings", True):
            text_pooled = text_pooled / (
                jnp.linalg.norm(text_pooled, axis=-1, keepdims=True) + 1e-12
            )
        if c.get("norm_img_embeddings", False):
            image_pooled = image_pooled / (
                jnp.linalg.norm(image_pooled, axis=-1, keepdims=True) + 1e-12
            )
        out = {
            "scores": image_pooled,
            "targets": text_pooled,
            "embedding_1": image_pooled,
            "embedding_2": text_pooled,
            "temperature": self.param(
                "temperature", nn.initializers.constant(0.07), ()
            ),
        }
        if input_mask is not None:
            out["text_len"] = jnp.sum(input_mask, axis=-1).reshape(-1)
        return out
