"""Classic (pre-transformer) attention modules
(parity with mmf/modules/attention.py).

Top-down attention for the Pythia family plus MCAN-style self/guided
attention for MoVie+MCAN. Transformer attention lives in
mmf_tpu/modules/transformer.py (backed by the ops kernel dispatcher).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.modules.layers import (
    GatedTanh,
    ModalCombineLayer,
    TransformLayer,
)
from mmf_tpu.ops.attention import dot_product_attention

EPS = 1.0e-08


class ConcatenationAttention(nn.Module):
    """(reference attention.py:40-58)"""

    hidden_size: int

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        num_location = image_feat.shape[1]
        q_expand = jnp.broadcast_to(
            question_embedding[:, None, :],
            (question_embedding.shape[0], num_location,
             question_embedding.shape[-1]),
        )
        concat = jnp.concatenate([image_feat, q_expand], axis=2)
        raw = nn.Dense(1, name="lc")(GatedTanh(self.hidden_size, name="fa")(concat))
        weights = nn.softmax(raw, axis=1)
        return jnp.broadcast_to(weights, image_feat.shape)


class ProjectAttention(nn.Module):
    """(reference attention.py:61-88)"""

    hidden_size: int
    dropout: float = 0.2

    def compute_raw_att(self, image_feat, question_embedding,
                        deterministic=True):
        image_fa = GatedTanh(self.hidden_size, name="fa_image")(image_feat)
        question_fa = GatedTanh(self.hidden_size, name="fa_txt")(
            question_embedding
        )
        joint = image_fa * question_fa[:, None, :]
        joint = nn.Dropout(self.dropout)(joint, deterministic)
        return nn.Dense(1, name="lc")(joint)

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        raw = self.compute_raw_att(image_feat, question_embedding, deterministic)
        weights = nn.softmax(raw, axis=1)
        return jnp.broadcast_to(weights, image_feat.shape)


class DoubleProjectAttention(nn.Module):
    """(reference attention.py:91-110)"""

    hidden_size: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        att1 = ProjectAttention(
            self.hidden_size, self.dropout, name="att1"
        ).compute_raw_att(image_feat, question_embedding, deterministic)
        att2 = ProjectAttention(
            self.hidden_size, self.dropout, name="att2"
        ).compute_raw_att(image_feat, question_embedding, deterministic)
        weights = nn.softmax(att1 + att2, axis=1)
        return jnp.broadcast_to(weights, image_feat.shape)


class TopDownAttention(nn.Module):
    """Combine -> transform -> normalize, with location masking
    (reference attention.py:113-163)."""

    combine_type: str
    img_feat_dim: int
    txt_emb_dim: int
    combine_params: Any
    transform_type: str
    transform_params: Any
    normalization: str = "softmax"

    @staticmethod
    def _mask_attentions(attention, image_locs):
        num_loc = attention.shape[1]
        idx = jnp.arange(num_loc)[None, :, None]
        mask = idx >= image_locs.reshape(-1, 1, 1)
        return jnp.where(mask, 0.0, attention)

    @nn.compact
    def __call__(self, image_feat, question_embedding, image_locs=None,
                 deterministic=True, **kwargs):
        combined = ModalCombineLayer(
            self.combine_type, self.img_feat_dim, self.txt_emb_dim,
            self.combine_params, name="combination_layer",
        )(image_feat, question_embedding, deterministic=deterministic, **kwargs)
        if isinstance(combined, tuple):  # top_down_attention_lstm returns state
            combined, state = combined
        raw_attn = TransformLayer(
            self.transform_type, **(self.transform_params or {}),
            name="transform",
        )(combined)

        if self.normalization.lower() == "softmax":
            attention = nn.softmax(raw_attn, axis=1)
            if image_locs is not None:
                masked = self._mask_attentions(attention, image_locs)
                s = jnp.sum(masked, axis=1, keepdims=True)
                s = s + (s == 0).astype(s.dtype) + EPS
                masked = masked / s
            else:
                masked = attention
        elif self.normalization.lower() == "sigmoid":
            attention = nn.sigmoid(raw_attn)
            masked = (
                self._mask_attentions(attention, image_locs)
                if image_locs is not None
                else attention
            )
        else:
            raise ValueError(self.normalization)
        return masked


class AttentionLayer(nn.Module):
    """Config-driven dispatcher (reference attention.py:11-37)."""

    image_dim: int
    question_dim: int
    modal_combine: Any = None
    transform: Any = None
    normalization: str = "softmax"

    @nn.compact
    def __call__(self, *args, deterministic=True, **kwargs):
        mc = dict(self.modal_combine or {})
        tr = dict(self.transform or {})
        return TopDownAttention(
            mc["type"], self.image_dim, self.question_dim, mc.get("params"),
            tr["type"], tr.get("params"), self.normalization, name="module",
        )(*args, deterministic=deterministic, **kwargs)


class TorchMultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` analog, batch-first.

    mmf_bert composes raw MultiheadAttention blocks for its text
    self-attention, image intra-attention and text->image cross-attention
    (reference mmf_bert.py:91-92, 120-123, 129-131). Projections are kept
    separate (q/k/v/out); the torch packed ``in_proj_weight`` is split
    into thirds on checkpoint conversion. ``key_padding_mask`` follows the
    torch convention: True marks keys to IGNORE.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None,
                 deterministic=True):
        b, sq = query.shape[0], query.shape[1]
        d = self.embed_dim // self.num_heads

        def proj(x, name):
            x = nn.Dense(self.embed_dim, name=name, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
            return x.reshape(b, -1, self.num_heads, d).transpose(0, 2, 1, 3)

        qh = proj(query, "q_proj")
        kh = proj(key, "k_proj")
        vh = proj(value, "v_proj")
        bias = None
        if key_padding_mask is not None:
            bias = jnp.where(
                key_padding_mask, -1e9, 0.0
            ).astype(jnp.float32)[:, None, None, :]
        rate = 0.0 if deterministic else self.dropout
        ctx = dot_product_attention(
            qh, kh, vh, bias=bias, dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
            train=not deterministic,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, sq, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj", dtype=self.dtype,
                        param_dtype=jnp.float32)(ctx)


class MovieMcanMultiHeadAttention(nn.Module):
    """MCAN multi-head attention (reference attention.py:165-212)."""

    dim: int
    num_attn: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic=True):
        b = q.shape[0]
        d = self.dim // self.num_attn

        def proj(x, name):
            x = nn.Dense(self.dim, name=name, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
            return x.reshape(b, -1, self.num_attn, d).transpose(0, 2, 1, 3)

        qh, kh, vh = proj(q, "q_lin"), proj(k, "k_lin"), proj(v, "v_lin")
        bias = None
        if mask is not None:
            bias = jnp.where(mask, -1e9, 0.0).astype(jnp.float32)
            if bias.ndim == 2:
                bias = bias[:, None, None, :]
        # dropout applies to the attention map, not the context
        # (reference attention.py:192-196: p_attn = dropout(p_attn))
        rate = 0.0 if deterministic else self.dropout
        ctx = dot_product_attention(
            qh, kh, vh, bias=bias, dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
            train=not deterministic,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, -1, self.dim)
        return nn.Dense(self.dim, name="out_lin", dtype=self.dtype,
                        param_dtype=jnp.float32)(ctx)


class MCANFFN(nn.Module):
    dim: int
    ff_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.relu(nn.Dense(self.ff_dim, name="fc", dtype=self.dtype,
                             param_dtype=jnp.float32)(x))
        h = nn.Dropout(self.dropout)(h, deterministic)
        return nn.Dense(self.dim, name="out", dtype=self.dtype,
                        param_dtype=jnp.float32)(h)


class SelfAttention(nn.Module):
    """MCAN self-attention block (reference attention.py:213-234)."""

    dim: int
    num_attn: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None, deterministic=True):
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        att = MovieMcanMultiHeadAttention(
            self.dim, self.num_attn, self.dropout, dtype=self.dtype,
            name="mhatt",
        )(x, x, x, x_mask, deterministic)
        x = nn.LayerNorm(name="ln1", **ln)(
            x + nn.Dropout(self.dropout)(att, deterministic)
        )
        ff = MCANFFN(self.dim, self.dim * 4, self.dropout,
                     dtype=self.dtype, name="ffn")(x, deterministic)
        x = nn.LayerNorm(name="ln2", **ln)(
            x + nn.Dropout(self.dropout)(ff, deterministic)
        )
        return x


class SelfGuidedAttention(nn.Module):
    """MCAN guided attention block (reference attention.py:235-267)."""

    dim: int
    num_attn: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_mask=None, y_mask=None, deterministic=True):
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        att1 = MovieMcanMultiHeadAttention(
            self.dim, self.num_attn, self.dropout, dtype=self.dtype,
            name="mhatt1",
        )(x, x, x, x_mask, deterministic)
        x = nn.LayerNorm(name="ln1", **ln)(
            x + nn.Dropout(self.dropout)(att1, deterministic)
        )
        att2 = MovieMcanMultiHeadAttention(
            self.dim, self.num_attn, self.dropout, dtype=self.dtype,
            name="mhatt2",
        )(x, y, y, y_mask, deterministic)
        x = nn.LayerNorm(name="ln2", **ln)(
            x + nn.Dropout(self.dropout)(att2, deterministic)
        )
        ff = MCANFFN(self.dim, self.dim * 4, self.dropout,
                     dtype=self.dtype, name="ffn")(x, deterministic)
        x = nn.LayerNorm(name="ln3", **ln)(
            x + nn.Dropout(self.dropout)(ff, deterministic)
        )
        return x
