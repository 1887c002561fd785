"""Embedding modules (parity with mmf/modules/embeddings.py).

Text embeddings (vocab/bilstm/attention/mcan/projection dispatcher),
top-down image-feature attention pooling, and the MCAN/MoVie embedding
blocks. Recurrent layers use flax nn.RNN over LSTM/GRU cells (scan-based —
compiler-friendly sequential control flow)."""

from __future__ import annotations

import os
import pickle
from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmf_tpu.modules.attention import (
    AttentionLayer,
    SelfAttention,
    SelfGuidedAttention,
)
from mmf_tpu.modules.layers import AttnPool1d


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *a, **k):
        return x


class VocabEmbedding(nn.Module):
    """Token embedding table, optionally initialized from a vocab's
    pretrained vectors by the weight loader (reference embeddings.py:63)."""

    embedding_dim: int
    vocab_size: int = 30522

    @nn.compact
    def __call__(self, x):
        return nn.Embed(self.vocab_size, self.embedding_dim, name="module")(
            x.astype(jnp.int32)
        )


def _rnn(cell_type: str, hidden_size: int, bidirectional: bool, name: str):
    # nn.RNN shares scope with its parent, so the CELL carries the name —
    # this keeps param paths stable (f"{name}_fwd") for weight conversion
    cell_cls = {"LSTM": nn.OptimizedLSTMCell, "GRU": nn.GRUCell}[cell_type]
    rnn = nn.RNN(cell_cls(hidden_size, name=f"{name}_fwd"))
    if bidirectional:
        bwd = nn.RNN(cell_cls(hidden_size, name=f"{name}_bwd"), reverse=True,
                     keep_order=True)
        return rnn, bwd
    return rnn, None


class BiLSTMTextEmbedding(nn.Module):
    """(reference embeddings.py:75-116)"""

    hidden_dim: int
    embedding_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    bidirectional: bool = False
    rnn_type: str = "GRU"

    @nn.compact
    def __call__(self, x, forward_all: bool = False):
        hid = self.hidden_dim // (2 if self.bidirectional else 1)
        out = x
        for i in range(self.num_layers):
            fwd, bwd = _rnn(self.rnn_type, hid, self.bidirectional, f"rnn_{i}")
            o_f = fwd(out)
            if bwd is not None:
                o_b = bwd(out)
                out = jnp.concatenate([o_f, o_b], axis=-1)
            else:
                out = o_f
        if forward_all:
            return out
        if self.bidirectional:
            return out[:, -1]
        return out[:, -1]

    def forward_all(self, x):
        return self.__call__(x, forward_all=True)


class PreExtractedEmbedding:
    """Host-side lookup of precomputed question embeddings
    (reference embeddings.py:118-131). Not a flax module: pure IO."""

    def __init__(self, out_dim: int, base_path: str):
        self.text_out_dim = out_dim
        self.out_dim = out_dim
        self.base_path = base_path

    def __call__(self, qids):
        return np.stack([self.get_item(int(q)) for q in np.asarray(qids)], 0)

    @lru_cache(maxsize=5000)
    def get_item(self, qid: int):
        return np.load(os.path.join(self.base_path, f"{qid}.npy"))


class AttentionTextEmbedding(nn.Module):
    """LSTM + 2x conv1d attention over time (reference embeddings.py:136)."""

    hidden_dim: int
    embedding_dim: int
    num_layers: int = 1
    dropout: float = 0.0
    conv1_out: int = 512
    conv2_out: int = 2
    kernel_size: int = 1
    padding: int = 0
    bidirectional: bool = False

    @property
    def text_out_dim(self):
        return self.hidden_dim * self.conv2_out

    @nn.compact
    def __call__(self, x, deterministic=True):
        batch_size = x.shape[0]
        hid = self.hidden_dim // 2 if self.bidirectional else self.hidden_dim
        out = x
        for i in range(self.num_layers):
            fwd, bwd = _rnn("LSTM", hid, self.bidirectional, f"lstm_{i}")
            o_f = fwd(out)
            out = (
                jnp.concatenate([o_f, bwd(out)], axis=-1)
                if bwd is not None
                else o_f
            )
        lstm_drop = nn.Dropout(self.dropout)(out, deterministic)  # N,T,H

        # conv1d over time == Dense when kernel_size 1; general: nn.Conv
        h = nn.Conv(
            self.conv1_out, (self.kernel_size,), padding=self.padding,
            name="conv1",
        )(lstm_drop)
        h = nn.relu(h)
        h = nn.Conv(
            self.conv2_out, (self.kernel_size,), padding=self.padding,
            name="conv2",
        )(h)  # N,T,conv2_out
        attn = nn.softmax(h, axis=1)  # over time
        feat = jnp.einsum("bta,bth->bah", attn, lstm_drop)
        return feat.reshape(batch_size, -1)


class ProjectionEmbedding(nn.Module):
    """(reference embeddings.py:196-216)"""

    module: str
    in_dim: int
    out_dim: int
    convs: Optional[Sequence[dict]] = None

    @nn.compact
    def __call__(self, x):
        if self.module == "linear":
            return nn.Dense(self.out_dim, name="layers")(x)
        if self.module == "conv":
            h = x
            for i, conv in enumerate(self.convs or []):
                h = nn.Conv(
                    conv["out_channels"], (conv.get("kernel_size", 1),),
                    name=f"conv_{i}",
                )(h)
            return h
        raise TypeError(
            "Unknown module type for 'ProjectionEmbedding', use 'linear' or 'conv'"
        )


class TextEmbedding(nn.Module):
    """Dispatcher (reference embeddings.py:25-61)."""

    emb_type: str
    params: Any = None

    @nn.compact
    def __call__(self, *args, **kwargs):
        p = dict(self.params or {})
        t = self.emb_type
        if t == "identity":
            return args[0]
        if t == "vocab":
            return VocabEmbedding(
                p["embedding_dim"], p.get("vocab_size", 30522), name="module"
            )(*args)
        if t == "projection":
            return ProjectionEmbedding(
                p.get("module", "linear"), p.get("in_dim"), p.get("out_dim"),
                p.get("convs"), name="module",
            )(*args)
        if t == "bilstm":
            return BiLSTMTextEmbedding(
                p["hidden_dim"], p["embedding_dim"], p.get("num_layers", 1),
                p.get("dropout", 0.0), p.get("bidirectional", False),
                p.get("rnn_type", "GRU"), name="module",
            )(*args, **kwargs)
        if t == "attention":
            return AttentionTextEmbedding(
                p["hidden_dim"], p["embedding_dim"], p.get("num_layers", 1),
                p.get("dropout", 0.0), p.get("conv1_out", 512),
                p.get("conv2_out", 2), p.get("kernel_size", 1),
                p.get("padding", 0), p.get("bidirectional", False),
                name="module",
            )(*args, **kwargs)
        if t == "mcan":
            return SAEmbedding(
                p["hidden_dim"], p["embedding_dim"], name="module", **{
                    k: v for k, v in p.items()
                    if k not in ("hidden_dim", "embedding_dim")
                }
            )(*args, **kwargs)
        if t == "torch":
            return nn.Embed(
                p["vocab_size"], p["embedding_dim"], name="module"
            )(args[0].astype(jnp.int32))
        raise NotImplementedError(f"Unknown question embedding '{t}'")


class ImageFeatureEmbedding(nn.Module):
    """Top-down attention pooling of region features
    (reference embeddings.py:222-267)."""

    img_dim: int
    question_dim: int
    modal_combine: Any = None
    transform: Any = None
    normalization: str = "softmax"

    @nn.compact
    def __call__(self, image_feat_variable, question_embedding, image_dims,
                 extra=None, deterministic=True):
        attention = AttentionLayer(
            self.img_dim, self.question_dim,
            modal_combine=self.modal_combine, transform=self.transform,
            normalization=self.normalization, name="image_attention_model",
        )(image_feat_variable, question_embedding, image_dims,
          deterministic=deterministic)
        att_reshape = jnp.swapaxes(attention, 1, 2)  # N x n_att x K
        order_vectors = (extra or {}).get("order_vectors", None)
        if order_vectors is not None:
            image_feat_variable = jnp.concatenate(
                [image_feat_variable, order_vectors], axis=-1
            )
        tmp = jnp.matmul(att_reshape, image_feat_variable)  # N,n_att,img_dim
        return tmp.reshape(tmp.shape[0], -1), attention


class MultiHeadImageFeatureEmbedding(nn.Module):
    """(reference embeddings.py:268-287)"""

    img_dim: int
    question_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, image_feat_variable, question_embedding, image_dims,
                 extra=None, deterministic=True):
        from mmf_tpu.ops.attention import dot_product_attention

        b = image_feat_variable.shape[0]
        h = self.num_heads
        d = self.question_dim // h
        q = nn.Dense(self.question_dim, name="q_proj")(
            question_embedding[:, None, :]
        )
        k = nn.Dense(self.question_dim, name="k_proj")(image_feat_variable)
        v = nn.Dense(self.question_dim, name="v_proj")(image_feat_variable)

        def split(t):
            return t.reshape(b, t.shape[1], h, d).transpose(0, 2, 1, 3)

        ctx = dot_product_attention(split(q), split(k), split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, self.question_dim)
        out = nn.Dense(self.question_dim, name="out_proj")(ctx)
        return out[:, 0], None


class ImageFinetune(nn.Module):
    """fc7 finetune layer whose weights come from pickles
    (reference embeddings.py:289-306); weights installed by the loader."""

    in_dim: int
    weights_file: Optional[str] = None
    bias_file: Optional[str] = None
    out_dim_hint: int = 2048

    @nn.compact
    def __call__(self, image):
        out_dim = self.out_dim_hint
        kernel_init = nn.initializers.lecun_normal()
        bias_init = nn.initializers.zeros
        if self.weights_file and os.path.exists(self.weights_file):
            with open(self.weights_file, "rb") as w:
                weights = pickle.load(w)
            with open(self.bias_file, "rb") as b:
                bias = pickle.load(b)
            out_dim = bias.shape[0]
            kernel_init = lambda *a: jnp.asarray(np.asarray(weights).T)
            bias_init = lambda *a: jnp.asarray(np.asarray(bias))
        x = nn.Dense(
            out_dim, kernel_init=kernel_init, bias_init=bias_init, name="lc"
        )(image)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# MCAN / MoVie blocks (reference embeddings.py:462-640)
# ---------------------------------------------------------------------------
class SAEmbedding(nn.Module):
    """MCAN encoder: LSTM + self-attention stack (+ attention pooling)."""

    hidden_dim: int
    embedding_dim: int
    num_attn: int = 8
    num_layers: int = 6
    dropout: float = 0.1
    num_attn_pool: int = 1
    num_feat: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        b = x.shape[0]
        # LSTM stays f32 (sequential carry is precision-sensitive and
        # cheap); the attention stack below runs in compute dtype
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden_dim), name="lstm")
        out = rnn(x).astype(self.dtype)
        for i in range(self.num_layers):
            out = SelfAttention(
                self.hidden_dim, self.num_attn, self.dropout,
                dtype=self.dtype, name=f"self_attn_{i}",
            )(out, mask, deterministic)
        vec = out[:, -1:].reshape(b, 1, -1)
        if self.num_attn_pool > 0:
            vec = AttnPool1d(
                self.hidden_dim, self.num_feat * self.num_attn_pool,
                dtype=self.dtype, name="attn_pool",
            )(out, out, mask, deterministic)
            vec = vec.reshape(b, self.num_feat, -1)
        return out, vec


class SGAEmbedding(nn.Module):
    """MCAN decoder: guided-attention stack."""

    embedding_dim: int
    num_attn: int = 8
    num_layers: int = 6
    dropout: float = 0.1
    hidden_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_mask=None, y_mask=None, deterministic=True):
        if x.ndim == 4:
            b, c, hh, ww = x.shape
            x = x.reshape(b, c, -1).transpose(0, 2, 1)
        x = nn.Dense(self.hidden_dim, name="linear", dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        y = y.astype(self.dtype)
        for i in range(self.num_layers):
            x = SelfGuidedAttention(
                self.hidden_dim, self.num_attn, self.dropout,
                dtype=self.dtype, name=f"sga_{i}",
            )(x, y, x_mask, y_mask, deterministic)
        return x


class CBNEmbedding(nn.Module):
    """MoVie conditional-batchnorm bottleneck stack."""

    embedding_dim: int
    cond_dim: int
    cbn_num_layers: int = 4
    compressed: bool = True
    use_se: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, v, deterministic=True):
        from mmf_tpu.modules.bottleneck import MovieBottleneck

        out_dim = 1024
        emb_dim = self.embedding_dim
        for i in range(self.cbn_num_layers):
            x, _ = MovieBottleneck(
                emb_dim, out_dim // 4, self.cond_dim,
                downsample=(emb_dim != out_dim),
                compressed=self.compressed, use_se=self.use_se,
                dtype=self.dtype, name=f"cbn_{i}",
            )(x, v, deterministic)
            emb_dim = out_dim
        # adaptive avg pool to 1x1 == mean over spatial
        x = x.mean(axis=(2, 3))
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm",
                            dtype=self.dtype, param_dtype=jnp.float32)(x)


class TwoBranchEmbedding(nn.Module):
    """MoVie+MCAN two-branch image embedding."""

    embedding_dim: int
    cond_dim: int = 1024
    hidden_dim: int = 512
    num_attn: int = 8
    num_layers: int = 6
    dropout: float = 0.1
    cbn_num_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, v, x_mask=None, y_mask=None, deterministic=True):
        x_sga = SGAEmbedding(
            self.embedding_dim, self.num_attn, self.num_layers, self.dropout,
            self.hidden_dim, dtype=self.dtype, name="sga",
        )(x, y, x_mask, y_mask, deterministic)
        x_sga = AttnPool1d(self.hidden_dim, 1, dtype=self.dtype,
                           name="sga_pool")(
            x_sga, x_sga, x_mask, deterministic
        )[:, 0]
        x_cbn = CBNEmbedding(
            self.embedding_dim, self.cond_dim, self.cbn_num_layers,
            dtype=self.dtype, name="cbn",
        )(x, v, deterministic)
        return x_sga, x_cbn
