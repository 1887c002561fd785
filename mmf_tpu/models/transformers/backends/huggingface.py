"""The default transformer backend, registered as ``huggingface`` for
config compatibility with the reference
(mmf/models/transformers/backends/huggingface.py:162-231).

The reference's backend wraps a torch HuggingFace AutoModel; here the same
extension surface (generate_embeddings / generate_attention_mask /
generate_encoded_layers) is a flax module over the in-repo
TransformerEncoder, so BaseTransformer subclasses can pull a backend from
the registry (``config.backend.type``) and remain config-compatible.
Also registered under the honest alias ``flax``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.modules.transformer import TransformerConfig, TransformerEncoder
from mmf_tpu.ops.attention import make_attention_bias


class BackendEmbeddings(nn.Module):
    """Per-modality token/position/segment embeddings concatenated into one
    joint sequence (reference HuggingfaceEmbeddings, huggingface.py:19-160).
    Text modalities consuming raw ids get a token table; feature modalities
    get a linear projection."""

    modalities: Any
    tcfg: TransformerConfig

    @nn.compact
    def __call__(self, tokens_ids: List[jnp.ndarray],
                 position_ids: Optional[List[jnp.ndarray]] = None,
                 segment_ids: Optional[List[jnp.ndarray]] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        hidden = self.tcfg.hidden_size
        token_type = nn.Embed(
            len(self.modalities) + 1, hidden, name="token_type_embeddings",
            embedding_init=nn.initializers.normal(0.02),
        )
        parts = []
        for idx, modality in enumerate(self.modalities):
            raw = tokens_ids[idx]
            if modality.get("type") == "text" and raw.ndim == 2:
                emb = nn.Embed(
                    self.tcfg.vocab_size, hidden,
                    name=f"token_embeddings_{idx}",
                    embedding_init=nn.initializers.normal(0.02),
                )(raw.astype(jnp.int32))
            else:
                emb = nn.Dense(hidden, name=f"token_proj_{idx}")(raw)
            seq_len = emb.shape[1]
            if position_ids is not None and position_ids[idx] is not None:
                pos_ids = position_ids[idx]
            else:
                pos_ids = jnp.arange(seq_len)[None, :]
            pos_dim = modality.get("position_dim", 512)
            emb = emb + nn.Embed(
                max(pos_dim, seq_len), hidden, name=f"pos_embeddings_{idx}",
                embedding_init=nn.initializers.normal(0.02),
            )(pos_ids)
            seg = modality.get("segment_id", -1)
            if segment_ids is not None and segment_ids[idx] is not None:
                emb = emb + token_type(segment_ids[idx].astype(jnp.int32))
            elif seg != -1:
                emb = emb + token_type(
                    jnp.full(emb.shape[:2], seg, jnp.int32)
                )
            emb = nn.LayerNorm(epsilon=1e-12, name=f"layer_norm_{idx}")(emb)
            emb = nn.Dropout(self.tcfg.hidden_dropout_prob)(
                emb, deterministic
            )
            parts.append(emb)
        return jnp.concatenate(parts, axis=1)


@registry.register_transformer_backend("huggingface")
@registry.register_transformer_backend("flax")
class FlaxBackend(nn.Module):
    """(reference HuggingfaceBackend, huggingface.py:163-231)"""

    config: Any = None

    def setup(self):
        cfg = dict(self.config or {})
        self.tcfg = TransformerConfig.from_dict(
            {
                "hidden_size": cfg.get("hidden_size", 768),
                "num_hidden_layers": cfg.get("num_hidden_layers", 12),
                "num_attention_heads": cfg.get("num_attention_heads", 12),
                "vocab_size": cfg.get("vocab_size", 30522),
                "dtype": cfg.get("dtype", "float32"),
            }
        )
        self.embeddings = BackendEmbeddings(
            modalities=cfg.get("modalities", []), tcfg=self.tcfg
        )
        self.encoder = TransformerEncoder(self.tcfg)

    def get_config(self) -> Dict[str, Any]:
        return dict(self.config or {})

    def generate_embeddings(self, tokens_ids, position_ids=None,
                            segment_ids=None, attention_mask=None,
                            deterministic: bool = True) -> jnp.ndarray:
        return self.embeddings(
            tokens_ids, position_ids, segment_ids, deterministic
        )

    def generate_attention_mask(self, masks: List[jnp.ndarray]) -> jnp.ndarray:
        return jnp.concatenate(masks, axis=1)

    def generate_encoded_layers(self, embedding, attention_mask,
                                deterministic: bool = True) -> jnp.ndarray:
        bias = make_attention_bias(attention_mask, self.tcfg.dtype)
        return self.encoder(embedding, bias=bias, deterministic=deterministic)

    def __call__(self, tokens_ids, masks, position_ids=None,
                 segment_ids=None, deterministic: bool = True):
        emb = self.generate_embeddings(
            tokens_ids, position_ids, segment_ids,
            deterministic=deterministic,
        )
        attention_mask = self.generate_attention_mask(masks)
        return self.generate_encoded_layers(
            emb, attention_mask, deterministic=deterministic
        ), attention_mask
