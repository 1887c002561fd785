"""Vision Transformer on the shared trunk (parity with mmf/modules/vit.py).

Accepts either raw images (patch embedding) or precomputed embeddings —
the latter is how ViLT feeds concatenated text+image embeddings through
the ViT encoder (reference vit.py:35-178)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.modules.transformer import (
    ACT2FN,
    TransformerConfig,
    Pooler,
    _dense,
)
from mmf_tpu.ops.attention import dot_product_attention, make_attention_bias


class ViTPatchEmbeddings(nn.Module):
    hidden_size: int = 768
    patch_size: int = 16
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True):
        # NCHW -> NHWC
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))
        x = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="projection",
        )(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_size),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c)), x], axis=1
        )
        num_positions = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (1, num_positions, self.hidden_size), jnp.float32,
        )
        return x + pos[:, : x.shape[1]].astype(x.dtype)


class ViTLayer(nn.Module):
    """Pre-LN transformer block: LN -> MHA -> +res; LN -> MLP -> +res
    (HF ViTLayer; ViT is pre-norm, unlike BERT's post-norm)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, hidden, bias=None, deterministic=True):
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="layernorm_before",
        )(hidden)
        q = _dense(cfg, cfg.hidden_size, "attention_query")(x)
        k = _dense(cfg, cfg.hidden_size, "attention_key")(x)
        v = _dense(cfg, cfg.hidden_size, "attention_value")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, d).transpose(
                0, 2, 1, 3
            )

        rate = 0.0 if deterministic else cfg.attention_probs_dropout_prob
        ctx = dot_product_attention(
            split(q), split(k), split(v), bias=bias, dropout_rate=rate,
            dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
            train=not deterministic,
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(
            x.shape[0], x.shape[1], cfg.hidden_size
        )
        att = _dense(cfg, cfg.hidden_size, "attention_output_dense")(ctx)
        att = nn.Dropout(cfg.hidden_dropout_prob)(att, deterministic)
        hidden = hidden + att

        y = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="layernorm_after",
        )(hidden)
        y = _dense(cfg, cfg.intermediate_size, "intermediate_dense")(y)
        y = ACT2FN[cfg.hidden_act](y)
        y = _dense(cfg, cfg.hidden_size, "output_dense")(y)
        y = nn.Dropout(cfg.hidden_dropout_prob)(y, deterministic)
        return hidden + y


class ViTEncoder(nn.Module):
    config: TransformerConfig
    num_layers: Optional[int] = None

    @nn.compact
    def __call__(self, hidden, bias=None, deterministic=True):
        n = self.num_layers or self.config.num_hidden_layers
        for i in range(n):
            hidden = ViTLayer(self.config, name=f"layer_{i}")(
                hidden, bias, deterministic
            )
        return hidden


class ViTModel(nn.Module):
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    image_size: int = 224
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.0
    do_patch_embeddings: bool = True
    add_pooling_layer: bool = True
    dtype: Any = jnp.float32

    def _cfg(self):
        return TransformerConfig(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            layer_norm_eps=self.layer_norm_eps,
            hidden_dropout_prob=self.hidden_dropout_prob,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic=True
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self._cfg()
        if self.do_patch_embeddings:
            x = ViTPatchEmbeddings(
                self.hidden_size, self.patch_size, self.image_size,
                self.dtype, name="embeddings",
            )(x, deterministic)
        bias = None
        if attention_mask is not None:
            bias = make_attention_bias(attention_mask, cfg.dtype)
        seq = ViTEncoder(cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )
        seq = nn.LayerNorm(
            epsilon=self.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="layernorm",
        )(seq)
        pooled = Pooler(cfg, name="pooler")(seq) if self.add_pooling_layer else None
        return seq, pooled
