"""NN building blocks (parity with mmf/modules/layers.py).

ClassifierLayer dispatcher, gated/weight-normed FCs, modal combine layers
(MFH / element-multiply / top-down-attention-LSTM), BAN's BCNet/BiAttention,
MoVie+MCAN's branch combiner, attention pools — all as flax modules.

Stateful torch idioms are re-founded functionally: the top-down-attention
LSTM's hidden state is threaded through call arguments instead of a
registry side channel; BatchNorm layers become LayerNorm (no cross-batch
state to sync across the mesh, same normalization role at these scales).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.common.registry import registry


def wn_dense(features: int, name: str = None, scalar_norm: bool = True):
    """weight_norm(nn.Linear, dim=None) analog."""
    return nn.WeightNorm(
        nn.Dense(features),
        variable_filter={"kernel"},
        feature_axes=None if scalar_norm else -1,
        name=name,
    )


class ConvNet(nn.Module):
    """conv + leaky-relu + maxpool + BatchNorm (reference layers.py:12-41).
    Real BatchNorm semantics (flax ``batch_stats`` collection; the trainer
    threads mutable collections through the fused step)."""

    out_channels: int
    kernel_size: int
    padding_size: Any = "same"
    pool_stride: int = 2
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        pad = (
            self.kernel_size // 2
            if self.padding_size == "same"
            else self.padding_size
        )
        # NCHW (torch layout in callers) -> NHWC for flax conv
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Conv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            padding=pad, name="conv",
        )(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.max_pool(
            x, (self.pool_stride, self.pool_stride),
            strides=(self.pool_stride, self.pool_stride),
        )
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=deterministic, epsilon=1e-5,
                name="norm",
            )(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class Flatten(nn.Module):
    @nn.compact
    def __call__(self, x):
        if x.ndim > 1:
            return x.reshape(x.shape[0], -1)
        return x


class GatedTanh(nn.Module):
    """y = tanh(Wx) * sigmoid(W'x) (reference layers.py:58-82)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        y_tilda = jnp.tanh(nn.Dense(self.out_dim, name="fc")(x))
        gated = nn.sigmoid(nn.Dense(self.out_dim, name="gate_fc")(x))
        return y_tilda * gated


class ReLUWithWeightNormFC(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.relu(wn_dense(self.out_dim, name="fc")(x))


class FCNet(nn.Module):
    """Stack of weight-normed dense + activation (reference layers.py:611)."""

    dims: Sequence[int]
    act: Optional[str] = "ReLU"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        act = {"ReLU": nn.relu, "relu": nn.relu, None: lambda v: v}[self.act]
        for i in range(len(self.dims) - 1):
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic)
            x = wn_dense(self.dims[i + 1], name=f"fc_{i}")(x)
            x = act(x)
        return x


# ---------------------------------------------------------------------------
# classifiers
# ---------------------------------------------------------------------------
class WeightNormClassifier(nn.Module):
    out_dim: int
    hidden_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.relu(wn_dense(self.hidden_dim, name="fc1")(x))
        x = nn.Dropout(self.dropout)(x, deterministic)
        return wn_dense(self.out_dim, name="fc2")(x)


class LogitClassifier(nn.Module):
    """Pythia's two-branch logit head (reference layers.py:189-218)."""

    out_dim: int
    text_hidden_dim: int
    img_hidden_dim: int

    @nn.compact
    def __call__(self, joint_embedding, deterministic=True, branch=None):
        # branch="text": only linear_text(f_o_text(.)) — the
        # pythia_question_only scoring path (reference pythia.py:326-328)
        text = nn.Dense(self.out_dim, name="linear_text")(
            ReLUWithWeightNormFC(self.text_hidden_dim, name="f_o_text")(
                joint_embedding
            )
        )
        if branch == "text":
            return text
        image = nn.Dense(self.out_dim, name="linear_image")(
            ReLUWithWeightNormFC(self.img_hidden_dim, name="f_o_image")(
                joint_embedding
            )
        )
        return text + image


class MLPClassifier(nn.Module):
    out_dim: int
    hidden_dim: Optional[int] = None
    num_layers: int = 0
    dropout: float = 0.5
    hidden_act: str = "relu"
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.hidden_act]
        hidden = self.hidden_dim or x.shape[-1]
        for i in range(self.num_layers):
            x = nn.Dense(hidden, name=f"dense_{i}")(x)
            if self.batch_norm:
                # real BatchNorm1d semantics (reference layers.py:178);
                # batch_stats flow through the trainer's mutable step
                x = nn.BatchNorm(
                    use_running_average=deterministic, epsilon=1e-5,
                    name=f"norm_{i}",
                )(x)
            x = act(x)
            x = nn.Dropout(self.dropout)(x, deterministic)
        return nn.Dense(self.out_dim, name="out")(x)


class TripleLinear(nn.Module):
    """Three-branch classifier (reference layers.py:687-698): all branches
    predict at train time, branch 0 at inference."""

    out_dim: int

    @nn.compact
    def __call__(self, joint_embedding, train=False):
        dense = [nn.Dense(self.out_dim, name=f"linear_{i}") for i in range(3)]
        if train:
            feats = [dense[i](joint_embedding[:, i]) for i in range(3)]
            return jnp.stack(feats, axis=1)
        # flax materializes params only on CALL — linear_1/linear_2 must
        # run here too (jit DCEs the unused outputs) or an eval-mode init
        # followed by a train-mode apply hits ScopeParamNotFoundError
        for i in (1, 2):
            _ = dense[i](joint_embedding)
        return dense[0](joint_embedding)


class BertClassifierHead(nn.Module):
    """dropout + BertPredictionHeadTransform + linear."""

    out_dim: int
    hidden_size: int = 768
    hidden_dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        from mmf_tpu.modules.transformer import (
            PredictionHeadTransform,
            TransformerConfig,
        )

        cfg = TransformerConfig(hidden_size=self.hidden_size)
        x = nn.Dropout(self.hidden_dropout_prob)(x, deterministic)
        x = PredictionHeadTransform(cfg, name="transform")(x)
        return nn.Dense(self.out_dim, name="decoder")(x)


class ClassifierLayer(nn.Module):
    """Dispatcher (reference layers.py:99-125)."""

    classifier_type: str
    in_dim: int
    out_dim: int
    params: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True, **kwargs):
        p = dict(self.params or {})
        t = self.classifier_type
        if t == "weight_norm":
            return WeightNormClassifier(
                self.out_dim, p.get("hidden_dim", self.in_dim),
                p.get("dropout", 0.0), name="module",
            )(x, deterministic)
        if t == "logit":
            return LogitClassifier(
                self.out_dim, p.get("text_hidden_dim", self.in_dim),
                p.get("img_hidden_dim", self.in_dim), name="module",
            )(x, deterministic, branch=kwargs.get("branch"))
        if t == "mlp":
            return MLPClassifier(
                self.out_dim, p.get("hidden_dim"), p.get("num_layers", 0),
                p.get("dropout", 0.5), p.get("hidden_act", "relu"),
                p.get("batch_norm", True), name="module",
            )(x, deterministic)
        if t == "triple_linear":
            return TripleLinear(self.out_dim, name="module")(
                x, train=not deterministic
            )
        if t == "bert":
            return BertClassifierHead(
                self.out_dim, p.get("hidden_size", 768), name="module"
            )(x, deterministic)
        if t == "linear":
            return nn.Dense(self.out_dim, name="module")(x)
        if t == "language_decoder":
            from mmf_tpu.modules.decoders import LanguageDecoder

            return LanguageDecoder(
                self.in_dim, self.out_dim, name="module", **p
            )(x, **kwargs)
        raise NotImplementedError(f"Unknown classifier type: {t}")


# ---------------------------------------------------------------------------
# modal combine layers (pythia family)
# ---------------------------------------------------------------------------
class MfbExpand(nn.Module):
    hidden_dim: int
    dropout: float

    @nn.compact
    def __call__(self, image_feat, question_embed, deterministic=True):
        image1 = nn.Dense(self.hidden_dim, name="lc_image")(image_feat)
        ques1 = nn.Dense(self.hidden_dim, name="lc_ques")(question_embed)
        if image_feat.ndim == 3:
            ques1 = jnp.broadcast_to(
                ques1[:, None, :], (ques1.shape[0], image_feat.shape[1],
                                    ques1.shape[-1])
            )
        joint = image1 * ques1
        return nn.Dropout(self.dropout)(joint, deterministic)


class MFHCombine(nn.Module):
    """High-order MFB pooling for modal combine (reference layers.py:286)."""

    hidden_sizes: Sequence[int]
    pool_size: int
    order: int
    dropout: float

    @property
    def out_dim(self):
        return int(sum(self.hidden_sizes) / self.pool_size)

    def _squeeze(self, joint):
        orig2d = joint.ndim == 2
        if orig2d:
            joint = joint[:, None, :]
        b, k, dim = joint.shape
        assert dim % self.pool_size == 0
        z = joint.reshape(b, k, dim // self.pool_size, self.pool_size).sum(3)
        z = jnp.sqrt(nn.relu(z)) - jnp.sqrt(nn.relu(-z))
        flat = z.reshape(b, -1)
        flat = flat / (jnp.linalg.norm(flat, axis=-1, keepdims=True) + 1e-12)
        z = flat.reshape(b, k, dim // self.pool_size)
        return z[:, 0] if orig2d else z

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        feature_list = []
        prev = 1.0
        for i in range(self.order):
            z_exp = MfbExpand(
                self.hidden_sizes[i], self.dropout, name=f"expand_{i}"
            )(image_feat, question_embedding, deterministic)
            if i > 0:
                z_exp = prev * z_exp
            prev = z_exp
            feature_list.append(self._squeeze(z_exp))
        return jnp.concatenate(feature_list, axis=-1)


class NonLinearElementMultiply(nn.Module):
    """(reference layers.py:369-403)"""

    hidden_dim: int
    dropout: float
    context_dim: Optional[int] = None

    @property
    def out_dim(self):
        return self.hidden_dim

    @nn.compact
    def __call__(self, image_feat, question_embedding, context_embedding=None,
                 deterministic=True, branch=None):
        # branch selects a single arm — the pythia_question_only /
        # pythia_image_only ablations use dropout(fa_txt(t)) or
        # dropout(fa_image(i)) alone (reference pythia.py:315-357)
        if branch == "text":
            question_fa = ReLUWithWeightNormFC(
                self.hidden_dim, name="fa_txt"
            )(question_embedding)
            return nn.Dropout(self.dropout)(question_fa, deterministic)
        if branch == "image":
            image_fa = ReLUWithWeightNormFC(
                self.hidden_dim, name="fa_image"
            )(image_feat)
            return nn.Dropout(self.dropout)(image_fa, deterministic)
        image_fa = ReLUWithWeightNormFC(self.hidden_dim, name="fa_image")(
            image_feat
        )
        question_fa = ReLUWithWeightNormFC(self.hidden_dim, name="fa_txt")(
            question_embedding
        )
        if image_feat.ndim == 3 and question_fa.ndim != 3:
            question_fa = question_fa[:, None, :]
        joint = image_fa * question_fa
        if context_embedding is not None:
            context_fa = ReLUWithWeightNormFC(
                self.hidden_dim, name="fa_context"
            )(context_embedding)
            joint = jnp.concatenate([joint, context_fa * question_fa], axis=1)
        return nn.Dropout(self.dropout)(joint, deterministic)


class TwoLayerElementMultiply(nn.Module):
    """(reference layers.py:443-470)"""

    hidden_dim: int
    dropout: float

    @property
    def out_dim(self):
        return self.hidden_dim

    @nn.compact
    def __call__(self, image_feat, question_embedding, deterministic=True):
        image_fa = ReLUWithWeightNormFC(self.hidden_dim, name="fa_image2")(
            ReLUWithWeightNormFC(self.hidden_dim, name="fa_image1")(image_feat)
        )
        question_fa = ReLUWithWeightNormFC(self.hidden_dim, name="fa_txt2")(
            ReLUWithWeightNormFC(self.hidden_dim, name="fa_txt1")(
                question_embedding
            )
        )
        if image_feat.ndim == 3:
            question_fa = jnp.broadcast_to(
                question_fa[:, None, :],
                (question_fa.shape[0], image_feat.shape[1], question_fa.shape[-1]),
            )
        joint = image_fa * question_fa
        return nn.Dropout(self.dropout)(joint, deterministic)


class TopDownAttentionLSTM(nn.Module):
    """BUTD's attention LSTM (reference layers.py:404-442). The LSTM state
    is an explicit (h2, h1c1) argument/return instead of registry state."""

    attention_dim: int
    hidden_dim: int
    dropout: float

    @property
    def out_dim(self):
        return self.attention_dim

    @nn.compact
    def __call__(self, image_feat, embedding, state, deterministic=True):
        (h1, c1), (h2, c2) = state["td_hidden"], state["lm_hidden"]
        image_feat_mean = image_feat.mean(axis=1)
        lstm = nn.OptimizedLSTMCell(self.hidden_dim, name="top_down_lstm")
        (c1, h1), _ = lstm(
            (c1, h1),
            jnp.concatenate([h2, image_feat_mean, embedding], axis=1),
        )
        new_state = dict(state)
        new_state["td_hidden"] = (h1, c1)

        image_fa = wn_dense(self.attention_dim, name="fa_image",
                            scalar_norm=False)(image_feat)
        hidden_fa = wn_dense(self.attention_dim, name="fa_hidden",
                             scalar_norm=False)(h1)
        joint = nn.relu(image_fa + hidden_fa[:, None, :])
        joint = nn.Dropout(self.dropout)(joint, deterministic)
        return joint, new_state


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------
class LinearTransform(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        return wn_dense(self.out_dim, name="lc")(x)


class ConvTransform(nn.Module):
    out_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        # 1x1 convs over the location axis == per-location MLP
        h = nn.relu(nn.Dense(self.hidden_dim, name="conv1")(x))
        return nn.Dense(self.out_dim, name="conv2")(h)


class TransformLayer(nn.Module):
    transform_type: str
    out_dim: int
    hidden_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        if self.transform_type == "linear":
            return LinearTransform(self.out_dim, name="module")(x)
        if self.transform_type == "conv":
            return ConvTransform(self.out_dim, self.hidden_dim, name="module")(x)
        raise NotImplementedError(
            f"Unknown post combine transform type: {self.transform_type}"
        )


# ---------------------------------------------------------------------------
# BAN bilinear attention (reference layers.py:537-679)
# ---------------------------------------------------------------------------
class BCNet(nn.Module):
    h_dim: int
    h_out: Optional[int]
    act: str = "ReLU"
    dropout: Optional[Sequence[float]] = None
    k: int = 3

    @nn.compact
    def __call__(self, v, q, deterministic=True, w=None):
        dropout = list(self.dropout or [0.2, 0.5])
        c = 32
        v_ = FCNet((v.shape[-1], self.h_dim * self.k), self.act, dropout[0],
                   name="v_net")(v, deterministic)
        q_ = FCNet((q.shape[-1], self.h_dim * self.k), self.act, dropout[0],
                   name="q_net")(q, deterministic)

        if w is not None:
            # forward_with_weights: logits_b = sum_ij v'_bi w_bij q'_bj
            logits = jnp.einsum("bvk,bvq,bqk->bk", v_, w, q_)
            if self.k > 1:
                b = logits.shape[0]
                logits = logits.reshape(b, -1, self.k).mean(-1) * self.k
            return logits

        if self.h_out is None:
            return jnp.einsum("bvk,bqk->bvqk", v_, q_)

        if self.h_out <= c:
            v_d = nn.Dropout(dropout[1])(v_, deterministic)
            h_mat = self.param(
                "h_mat", nn.initializers.normal(1.0),
                (1, self.h_out, 1, self.h_dim * self.k),
            )
            h_bias = self.param(
                "h_bias", nn.initializers.normal(1.0), (1, self.h_out, 1, 1)
            )
            logits = jnp.einsum(
                "bgvk,bqk->bgvq", v_d[:, None] * h_mat, q_
            )
            return logits + h_bias

        v_d = nn.Dropout(dropout[1])(v_, deterministic)
        d = jnp.einsum("bvk,bqk->bvqk", v_d, q_)
        logits = wn_dense(self.h_out, name="h_net")(d)
        return jnp.transpose(logits, (0, 3, 1, 2))


class BiAttention(nn.Module):
    z_dim: int
    glimpse: int
    dropout: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, v, q, v_mask=True, deterministic=True):
        v_num, q_num = v.shape[1], q.shape[1]
        logits = BCNet(
            self.z_dim, self.glimpse, dropout=self.dropout, k=3, name="logits"
        )(v, q, deterministic)
        if v_mask:
            v_abs_sum = jnp.abs(v).sum(2)
            mask = (v_abs_sum == 0)[:, None, :, None]
            logits = jnp.where(mask, -jnp.inf, logits)
        expanded = logits.reshape(-1, self.glimpse, v_num * q_num)
        p = nn.softmax(expanded, axis=2)
        return p.reshape(-1, self.glimpse, v_num, q_num), logits


class BranchCombineLayer(nn.Module):
    """(reference layers.py:699-736)"""

    img_dim: int
    ques_dim: int

    @property
    def out_dim(self):
        return self.img_dim * 2

    @nn.compact
    def __call__(self, v_cga, v_cbn, q, train=False):
        out_dim = self.img_dim * 2
        feat = [
            nn.LayerNorm(epsilon=1e-5, name="ln0")(
                nn.Dense(out_dim, name="linear_ques0")(q)
                + nn.Dense(out_dim, name="linear_cbn0")(v_cbn)
                + nn.Dense(out_dim, name="linear_cga0")(v_cga)
            ),
            nn.LayerNorm(epsilon=1e-5, name="ln1")(
                nn.Dense(out_dim, name="linear_cbn1")(v_cbn)),
            nn.LayerNorm(epsilon=1e-5, name="ln2")(
                nn.Dense(out_dim, name="linear_ques1")(q)
                + nn.Dense(out_dim, name="linear_cga1")(v_cga)
            ),
        ]
        if train:
            return jnp.stack(feat, axis=1)
        return feat[0]


class AttnPool1d(nn.Module):
    """MLP-scored attention pooling (reference layers.py:737-767)."""

    num_features: int
    num_attn: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, value, mask=None, deterministic=True):
        b = query.shape[0]
        score = nn.Dense(self.num_features // 2, name="lin1",
                         dtype=self.dtype, param_dtype=jnp.float32)(query)
        score = nn.relu(score)
        score = nn.Dropout(self.dropout)(score, deterministic)
        score = nn.Dense(self.num_attn, name="lin2", dtype=self.dtype,
                         param_dtype=jnp.float32)(score)
        score = jnp.swapaxes(score, -2, -1)
        if mask is not None:
            score = jnp.where(mask[:, None, :], -10000.0, score)
        p_attn = nn.softmax(score, axis=-1)
        return jnp.matmul(p_attn, value).reshape(b, self.num_attn, -1)


class AttnPool2d(nn.Module):
    """CLIP-style 2D attention pooling (reference layers.py:768-814)."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        from mmf_tpu.ops.attention import dot_product_attention

        b, c, hgt, wid = x.shape
        x = x.reshape(b, c, hgt * wid).transpose(0, 2, 1)  # B, HW, C
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
        )
        x = x + pos[None]
        h = self.num_heads
        d = self.embed_dim // h
        q = nn.Dense(self.embed_dim, name="q_proj")(x[:, :1])
        k = nn.Dense(self.embed_dim, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, name="v_proj")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, d).transpose(0, 2, 1, 3)

        ctx = dot_product_attention(split(q), split(k), split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, self.embed_dim)
        out = nn.Dense(self.output_dim or self.embed_dim, name="c_proj")(ctx)
        return out[:, 0]


class ModalCombineLayer(nn.Module):
    """Dispatcher (reference layers.py:246-264)."""

    combine_type: str
    img_feat_dim: int
    txt_emb_dim: int
    params: Any = None

    def get_out_dim(self):
        p = dict(self.params or {})
        if self.combine_type == "MFH":
            return int(sum(p["hidden_sizes"]) / p["pool_size"])
        if self.combine_type in (
            "non_linear_element_multiply", "two_layer_element_multiply"
        ):
            return p["hidden_dim"]
        if self.combine_type == "top_down_attention_lstm":
            return p["attention_dim"]
        raise NotImplementedError(self.combine_type)

    @nn.compact
    def __call__(self, *args, deterministic=True, **kwargs):
        p = dict(self.params or {})
        t = self.combine_type
        if t == "MFH":
            return MFHCombine(
                p["hidden_sizes"], p["pool_size"], p["order"],
                p.get("dropout", 0.0), name="module",
            )(*args, deterministic=deterministic, **kwargs)
        if t == "non_linear_element_multiply":
            return NonLinearElementMultiply(
                p["hidden_dim"], p.get("dropout", 0.0),
                p.get("context_dim"), name="module",
            )(*args, deterministic=deterministic, **kwargs)
        if t == "two_layer_element_multiply":
            return TwoLayerElementMultiply(
                p["hidden_dim"], p.get("dropout", 0.0), name="module"
            )(*args, deterministic=deterministic, **kwargs)
        if t == "top_down_attention_lstm":
            # the reference smuggles the LSTM state through a registry
            # side channel (layers.py:424-432); here recurrent state is
            # explicit — callers must thread it (BUTD does so via
            # BUTDStep; see models/butd.py)
            if "state" not in kwargs:
                raise ValueError(
                    "combine type 'top_down_attention_lstm' needs explicit "
                    "recurrent state: pass state={'td_hidden': (h,c), "
                    "'lm_hidden': (h,c)} through the attention call "
                    "(the BUTD decode loop threads it; see "
                    "mmf_tpu/models/butd.py)"
                )
            return TopDownAttentionLSTM(
                p["attention_dim"], p["hidden_dim"], p.get("dropout", 0.0),
                name="module",
            )(*args, deterministic=deterministic, **kwargs)
        raise NotImplementedError(f"Not implemented combine type: {t}")
