"""DETR-style transformer for UniT, faithful to the reference computation
(mmf/models/unit/transformer.py:13-316, itself DETR's transformer):

- the encoder runs over IMAGE tokens only; text memory is concatenated
  AFTER the encoder (transformer.py:149-205);
- position embeddings are injected into q and k at EVERY layer (never
  into v): sine grid pos for the encoder/cross-attention keys, learned
  query embeddings for the decoder queries (with_pos_embed,
  transformer.py:343-344, 422-423);
- decoder target starts at zeros (`tgt = torch.zeros_like(query_embed)`,
  transformer.py:160-162) with the query embedding acting purely as a
  per-layer positional signal;
- the decoder applies a final LayerNorm and returns ALL intermediate
  layer states (return_intermediate_dec=True, transformer.py:26,290-310);
- optional residual_in_encoder (memory = src + memory, transformer.py:178),
  enc2dec/pos projections when decoder dim differs (transformer.py:45-50),
  and a task-embedding token prefixed to the encoder input
  (transformer.py:218-235).

Layer naming mirrors the torch modules (self_attn/multihead_attn with
q/k/v/out splits, linear1/linear2, norm1..3) so converted reference
weights land by regex rename + fused in_proj split.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.ops.attention import dot_product_attention


def _split(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)


def _merge(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class _MHA(nn.Module):
    """q/k/v/out projections + scaled dot-product attention with dropout
    on the attention probs — the computation of torch's
    nn.MultiheadAttention as DETR uses it."""

    hidden: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, bias=None, deterministic=True):
        dn = dict(dtype=self.dtype, param_dtype=jnp.float32)
        q = nn.Dense(self.hidden, name="q", **dn)(q_in)
        k = nn.Dense(self.hidden, name="k", **dn)(k_in)
        v = nn.Dense(self.hidden, name="v", **dn)(v_in)
        rate = 0.0 if deterministic else self.dropout
        ctx = _merge(
            dot_product_attention(
                _split(q, self.num_heads),
                _split(k, self.num_heads),
                _split(v, self.num_heads),
                bias,
                dropout_rate=rate,
                dropout_rng=self.make_rng("dropout") if rate > 0.0 else None,
                train=not deterministic,
            )
        )
        return nn.Dense(self.hidden, name="out", dtype=self.dtype,
                        param_dtype=jnp.float32)(ctx)


def _with_pos(x, pos):
    return x if pos is None else x + pos


class DETREncoderLayer(nn.Module):
    """(reference transformer.py:318-392): post-norm by default; q=k=
    src+pos, v=src; FFN with inner dropout."""

    hidden: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, bias=None, deterministic=True):
        dn = dict(dtype=self.dtype, param_dtype=jnp.float32)
        attn = _MHA(self.hidden, self.num_heads, self.dropout,
                    dtype=self.dtype, name="self_attn")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic)  # noqa: E731
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", **dn)
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2", **dn)

        def ffn(x):
            x = nn.relu(nn.Dense(self.ffn_dim, name="linear1", **dn)(x))
            x = nn.Dropout(self.dropout)(x, deterministic)
            return nn.Dense(self.hidden, name="linear2", **dn)(x)

        if self.pre_norm:
            src2 = norm1(src)
            qk = _with_pos(src2, pos)
            src = src + drop(attn(qk, qk, src2, bias, deterministic))
            src2 = norm2(src)
            return src + drop(ffn(src2))
        qk = _with_pos(src, pos)
        src = norm1(src + drop(attn(qk, qk, src, bias, deterministic)))
        return norm2(src + drop(ffn(src)))


class DETRDecoderLayer(nn.Module):
    """(reference transformer.py:394-521): self-attention over queries
    (q=k=tgt+query_pos, v=tgt), cross-attention to memory (q=tgt+query_pos,
    k=memory+pos, v=memory), post-norm by default."""

    hidden: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None,
                 memory_bias=None, deterministic=True):
        dn = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self_attn = _MHA(self.hidden, self.num_heads, self.dropout,
                         dtype=self.dtype, name="self_attn")
        cross_attn = _MHA(self.hidden, self.num_heads, self.dropout,
                          dtype=self.dtype, name="multihead_attn")
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic)  # noqa: E731
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", **dn)
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2", **dn)
        norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3", **dn)

        def ffn(x):
            x = nn.relu(nn.Dense(self.ffn_dim, name="linear1", **dn)(x))
            x = nn.Dropout(self.dropout)(x, deterministic)
            return nn.Dense(self.hidden, name="linear2", **dn)(x)

        if self.pre_norm:
            tgt2 = norm1(tgt)
            qk = _with_pos(tgt2, query_pos)
            tgt = tgt + drop(self_attn(qk, qk, tgt2, None, deterministic))
            tgt2 = norm2(tgt)
            tgt = tgt + drop(cross_attn(
                _with_pos(tgt2, query_pos), _with_pos(memory, pos), memory,
                memory_bias, deterministic,
            ))
            tgt2 = norm3(tgt)
            return tgt + drop(ffn(tgt2))
        qk = _with_pos(tgt, query_pos)
        tgt = norm1(tgt + drop(self_attn(qk, qk, tgt, None, deterministic)))
        tgt = norm2(tgt + drop(cross_attn(
            _with_pos(tgt, query_pos), _with_pos(memory, pos), memory,
            memory_bias, deterministic,
        )))
        return norm3(tgt + drop(ffn(tgt)))


class DETREncoder(nn.Module):
    """(reference transformer.py:288-316 TransformerEncoder): final norm
    only in the pre-norm configuration."""

    hidden: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos=None, bias=None, deterministic=True):
        src = src.astype(self.dtype)
        for i in range(self.num_layers):
            src = DETREncoderLayer(
                self.hidden, self.num_heads, self.ffn_dim, self.dropout,
                self.pre_norm, dtype=self.dtype, name=f"layers_{i}",
            )(src, pos, bias, deterministic)
        if self.pre_norm:
            src = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype,
                               param_dtype=jnp.float32)(src)
        return src


class DETRDecoder(nn.Module):
    """(reference transformer.py:329-391 TransformerDecoder with
    return_intermediate=True): stacks every layer's output, each passed
    through the shared final LayerNorm."""

    hidden: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    dropout: float = 0.1
    pre_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, query_pos=None, pos=None,
                 memory_bias=None, deterministic=True):
        tgt = tgt.astype(self.dtype)
        memory = memory.astype(self.dtype)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.dtype,
                            param_dtype=jnp.float32)
        intermediate: List[jnp.ndarray] = []
        for i in range(self.num_layers):
            tgt = DETRDecoderLayer(
                self.hidden, self.num_heads, self.ffn_dim, self.dropout,
                self.pre_norm, dtype=self.dtype, name=f"layers_{i}",
            )(tgt, memory, query_pos, pos, memory_bias, deterministic)
            intermediate.append(norm(tgt))
        return jnp.stack(intermediate)  # [L, B, Q, D]


class UniTTransformerCore(nn.Module):
    """The UniTTransformer orchestration (reference transformer.py:80-236):
    image-only encoder, post-encoder text concat, per-(task, dataset)
    decoders (or one shared), task-embedding prefix, residual and
    projection options.

    All tensors are batch-first ([B, S, D]); the reference's [S, B, D]
    permutes are layout, not math.
    """

    d_model_enc: int = 256
    d_model_dec: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dropout: float = 0.1
    pre_norm: bool = False
    pass_pos_and_query: bool = True
    residual_in_encoder: bool = False
    share_decoders: bool = False
    use_task_embedding_in_img_encoder: bool = False
    # {task_type: [dataset_name, ...]} — which decoders exist
    decoder_index: Optional[Dict[str, Any]] = None
    MAX_TASK_NUM: int = 256
    dtype: Any = jnp.float32

    def _decoder(self, task_type: str, dataset_name: str) -> DETRDecoder:
        name = ("decoder_shared" if self.share_decoders
                else f"decoder_{task_type}_{dataset_name}")
        return DETRDecoder(
            self.d_model_dec, self.nheads, self.dim_feedforward,
            self.num_decoder_layers, self.dropout, self.pre_norm,
            dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(
        self,
        img_src=None,          # [B, N, d_model_enc] projected image tokens
        img_mask=None,         # [B, N] 1=valid
        img_pos=None,          # [B or 1, N, d_model_enc] sine grid pos
        text_src=None,         # [B, T, d_model_dec] projected BERT states
        text_mask=None,        # [B, T] 1=valid
        text_pos=None,         # [B or 1, T, d_model_dec]
        query_embed=None,      # [Q, d_model_dec] learned queries
        task_type: str = "detection",
        dataset_name: str = "detection_coco",
        task_idx: Optional[int] = None,
        deterministic: bool = True,
    ):
        from mmf_tpu.ops.attention import make_attention_bias

        memories = []
        pos_embeds = []
        masks = []

        if img_src is not None:
            B = img_src.shape[0]
            if not self.pass_pos_and_query:
                # (transformer.py:163-169): fold 0.1*pos into the input
                # once instead of injecting per layer
                img_src = img_src + 0.1 * img_pos
                img_pos = None
            if self.use_task_embedding_in_img_encoder:
                # (transformer.py:218-235): prefix one task token; strip
                # it from the memory afterwards (mem_out_begin_idx=1)
                task_table = self.param(
                    "task_embeddings_enc",
                    nn.initializers.normal(1.0),
                    (self.MAX_TASK_NUM, self.d_model_enc),
                )
                task_tok = jnp.broadcast_to(
                    task_table[task_idx][None, None], (B, 1, self.d_model_enc)
                )
                img_src = jnp.concatenate([task_tok, img_src], axis=1)
                if img_mask is not None:
                    img_mask = jnp.concatenate(
                        [jnp.ones((B, 1), img_mask.dtype), img_mask], axis=1
                    )
                if img_pos is not None:
                    pad = jnp.zeros_like(img_pos[:, :1])
                    img_pos = jnp.concatenate([pad, img_pos], axis=1)

            bias = (make_attention_bias(img_mask, img_src.dtype)
                    if img_mask is not None else None)
            memory = DETREncoder(
                self.d_model_enc, self.nheads, self.dim_feedforward,
                self.num_encoder_layers, self.dropout, self.pre_norm,
                dtype=self.dtype, name="encoder",
            )(img_src, img_pos, bias, deterministic)

            if self.use_task_embedding_in_img_encoder:
                img_src = img_src[:, 1:]
                memory = memory[:, 1:]
                if img_pos is not None:
                    img_pos = img_pos[:, 1:]
                if img_mask is not None:
                    img_mask = img_mask[:, 1:]

            if self.residual_in_encoder:
                memory = img_src + memory

            if self.d_model_dec != self.d_model_enc:
                memory = nn.Dense(self.d_model_dec, name="enc2dec_proj")(
                    memory
                )
                if img_pos is not None:
                    img_pos = nn.Dense(
                        self.d_model_dec, name="pos_embed_proj"
                    )(img_pos)

            memories.append(memory)
            pos_embeds.append(
                img_pos if img_pos is not None
                else jnp.zeros(memory.shape[1:], memory.dtype)[None]
            )
            masks.append(
                img_mask if img_mask is not None
                else jnp.ones(memory.shape[:2], jnp.int32)
            )

        if text_src is not None:
            memories.append(text_src)
            pos_embeds.append(
                text_pos if text_pos is not None
                else jnp.zeros(text_src.shape[1:], text_src.dtype)[None]
            )
            masks.append(
                text_mask if text_mask is not None
                else jnp.ones(text_src.shape[:2], jnp.int32)
            )

        B = memories[0].shape[0]
        memory = jnp.concatenate(memories, axis=1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(p, (B,) + p.shape[1:]) if p.shape[0] == 1
             else p for p in pos_embeds], axis=1,
        )
        mask = jnp.concatenate(masks, axis=1)
        memory_bias = make_attention_bias(mask, memory.dtype)

        query_pos = jnp.broadcast_to(
            query_embed[None], (B,) + query_embed.shape
        )
        # tgt starts at zeros; query_embed is purely positional
        # (transformer.py:160-162)
        tgt = jnp.zeros_like(query_pos)
        hs = self._decoder(task_type, dataset_name)(
            tgt, memory, query_pos, pos, memory_bias, deterministic
        )
        return hs, memory
