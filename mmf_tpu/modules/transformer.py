"""Shared transformer trunk (BERT-family) in flax.

This is the single encoder implementation behind VisualBERT, MMBT, ViLT,
M4C's MMT, the mmf_transformer backend, and the text side of ViLBERT —
replacing the reference's TorchScript BERT rewrites
(mmf/modules/hf_layers.py:96-477). Attention goes through
mmf_tpu.ops.dot_product_attention (XLA fused / Pallas flash), biases are
additive masks built once per batch.

bf16 policy: ``dtype`` is the compute dtype (activations); parameters stay
float32 (``param_dtype``) — the TPU-correct mixed-precision recipe (no loss
scaling needed, unlike the reference's CUDA amp).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmf_tpu.ops.attention import dot_product_attention, make_attention_bias

def _gelu(x):
    """GELU with a precision-matched implementation.

    torch/HF BERT compute the exact erf form, and the f32 path keeps it
    for <1e-4 converted-checkpoint logit parity. Under bf16 compute the
    exact erf is the single most expensive op in the encoder — it runs on
    the VPU and cannot hide behind the MXU (measured on v5e at VisualBERT
    eval shapes: 1182us vs 748us per FFN block, ~22% of the whole forward)
    — while the tanh approximation's error is below the noise bf16 itself
    introduces (max logit delta 0.047 vs 0.043 from bf16 alone, identical
    argmax; tools/benchmarks/prof_ffn.py). So: erf when x is f32, tanh
    when x is bf16. MMF_TPU_GELU=erf|tanh forces either.
    """
    import os

    forced = os.environ.get("MMF_TPU_GELU", "").lower()
    if forced in ("erf", "exact"):
        approx = False
    elif forced in ("tanh", "approx"):
        approx = True
    else:
        approx = x.dtype == jnp.bfloat16
    return nn.gelu(x, approximate=approx)


ACT2FN = {
    "gelu": _gelu,
    "relu": nn.relu,
    "silu": nn.silu,
    "swish": nn.silu,
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
}


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    dtype: Any = jnp.float32
    # remat policy for the backward — False (save everything, XLA
    # decides), True/"full" (recompute the whole layer on backward,
    # trading ~30% step FLOPs for O(layers) less HBM — the lever for
    # bigger batches), or "dots"/"dots_no_batch"
    # (jax.checkpoint_policies: keep matmul outputs, recompute
    # elementwise). Measured sweep in BENCH_NOTES.md.
    remat: Any = False
    # "none" | "int8": route the trunk's Dense matmuls through the
    # int8 MXU path (dynamic per-token activation + per-channel weight
    # quantization, ops/quant.py). Serving-precision knob; params stay
    # f32 so checkpoints are unaffected. MMF_TPU_QUANT overrides.
    quant: str = "none"
    # Mixture-of-experts (beyond reference parity): when moe_experts > 0
    # every ``moe_every``-th layer swaps its dense FFN for a
    # modules/moe.py MoEFeedForward with this many experts; expert
    # weights shard over the mesh's model axis (expert parallelism).
    moe_experts: int = 0
    moe_every: int = 2
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # HF nn.Embedding(padding_idx=pad_token_id) semantics: the pad row of
    # word_embeddings receives zero gradient (BertConfig.pad_token_id
    # defaults to 0). Implemented as stop_gradient on pad positions —
    # forward-identical, grad-exact vs torch. None disables.
    pad_token_id: Any = 0
    # Sequence parallelism (beyond reference — MMF has none): route
    # self-attention through ring attention over the mesh's ``model``
    # axis (ops/ring_attention.py), sharding the sequence so the [S, S]
    # score matrix never materializes on any one chip. YAML-reachable as
    # ``model_config.<model>.sequence_parallel: true`` (or globally via
    # ``training.sequence_parallel``). Applies when the mesh's model
    # axis > 1, the sequence divides it, and the attention bias is a
    # padding mask ([B,1,1,S]); otherwise falls back to dense attention.
    sequence_parallel: bool = False
    # Pipeline parallelism (beyond reference): run the trunk's layers as
    # ``pipeline_stages`` GPipe-style stages over the mesh's ``model``
    # axis with ``pipeline_microbatches`` microbatches
    # (parallel/pipeline.py SPMD formulation). Param layout is unchanged
    # (unrolled layer_i scopes — checkpoints stay compatible); stacking
    # into the stage layout happens inside the jitted step.
    # YAML-reachable as ``model_config.<model>.pipeline_stages`` (or
    # ``training.pipeline.num_stages`` / ``num_microbatches``).
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0

    @classmethod
    def from_dict(cls, d, **overrides):
        d = dict(d or {})
        d.update(overrides)
        fields = {f.name for f in dataclasses.fields(cls)}
        if d.get("dtype") in ("bfloat16", "bf16"):
            d["dtype"] = jnp.bfloat16
        elif d.get("dtype") in ("float32", "fp32"):
            d["dtype"] = jnp.float32
        return cls(**{k: v for k, v in d.items() if k in fields})


_WARNED: set = set()


def _warn_once(msg: str):
    if msg not in _WARNED:
        _WARNED.add(msg)
        import logging

        logging.getLogger("mmf_tpu").warning(msg)


def apply_padding_idx(embeds, input_ids, pad_token_id=0):
    """torch ``nn.Embedding(padding_idx=...)`` gradient semantics: pad
    positions contribute zero gradient to the embedding table (HF BERT
    builds word_embeddings with padding_idx=config.pad_token_id).
    Forward-identity — only the VJP changes."""
    if pad_token_id is None:
        return embeds
    is_pad = (input_ids == pad_token_id)[..., None]
    return jnp.where(is_pad, jax.lax.stop_gradient(embeds), embeds)


class ResidualLayerNorm(nn.Module):
    """LayerNorm(x [+ residual]) — the fused Pallas kernel on TPU
    (ops/layernorm.py; the XLA LN fusions measured 52% of the flagship
    forward), flax-equivalent XLA math elsewhere. Param names (scale,
    bias) and the module scope match ``nn.LayerNorm`` exactly so
    checkpoints and converted torch weights are unaffected."""

    hidden_size: int
    epsilon: float = 1e-12

    @nn.compact
    def __call__(self, x, residual=None):
        from mmf_tpu.ops.layernorm import layer_norm

        scale = self.param(
            "scale", nn.initializers.ones, (self.hidden_size,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.hidden_size,), jnp.float32
        )
        return layer_norm(
            x, scale, bias, residual=residual, eps=self.epsilon
        )


def _quant_mode(cfg: TransformerConfig) -> str:
    import os

    forced = os.environ.get("MMF_TPU_QUANT", "").lower()
    if forced in ("int8",):
        return "int8"
    if forced in ("none", "off", "float", "0"):
        return "none"
    if forced:
        raise ValueError(
            f"Unsupported MMF_TPU_QUANT={forced!r}; supported modes are "
            "'int8' and 'none'."
        )
    mode = (cfg.quant or "none").lower()
    if mode not in ("int8", "none"):
        raise ValueError(
            f"Unsupported quant mode {cfg.quant!r}; supported modes are "
            "'int8' and 'none'."
        )
    return mode


def _dense(cfg: TransformerConfig, features: int, name: str) -> nn.Module:
    if _quant_mode(cfg) == "int8":
        from mmf_tpu.ops.quant import QuantDense

        return QuantDense(
            features,
            dtype=cfg.dtype,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            name=name,
        )
    return nn.Dense(
        features,
        dtype=cfg.dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
    )


class SelfAttention(nn.Module):
    """Multi-head attention block. Supports self- and cross-attention
    (kv from a different stream — the ViLBERT co-attention case)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, hidden, kv=None, bias=None, deterministic=True,
                 output_attentions=False, prefix_kv=None, return_kv=False):
        """``prefix_kv``: cached (k, v) of loop-invariant prefix tokens
        ([B, H, S_prefix, D] each) prepended to this call's keys/values —
        the incremental-decode path (e.g. M4C's prefix-LM decoder, where
        encoder tokens never attend to decoder tokens). ``return_kv``
        additionally returns this call's own split (k, v) so a prefill
        pass can build that cache."""
        cfg = self.config
        if kv is None:
            kv = hidden
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h

        q = _dense(cfg, cfg.hidden_size, "query")(hidden)
        k = _dense(cfg, cfg.hidden_size, "key")(kv)
        v = _dense(cfg, cfg.hidden_size, "value")(kv)

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], h, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        own_kv = (k, v) if return_kv else None
        if prefix_kv is not None:
            k = jnp.concatenate([prefix_kv[0], k], axis=2)
            v = jnp.concatenate([prefix_kv[1], v], axis=2)
        ctx = None
        if (
            cfg.sequence_parallel
            and prefix_kv is None
            and not return_kv
            and kv is hidden
            and (bias is None or (bias.ndim == 4 and bias.shape[2] == 1))
        ):
            from mmf_tpu.parallel import mesh as mesh_lib

            mesh = mesh_lib.get_mesh()
            sp = mesh.shape.get("model", 1)
            if sp > 1 and q.shape[2] % sp == 0:
                from mmf_tpu.ops.ring_attention import ring_attention_sharded

                if not deterministic and \
                        cfg.attention_probs_dropout_prob > 0.0:
                    _warn_once(
                        "sequence_parallel: ring attention does not apply "
                        "attention-probs dropout (hidden dropout is "
                        "unaffected); set attention_probs_dropout_prob=0 "
                        "to silence this"
                    )
                key_mask = None
                if bias is not None:
                    # padding-mask bias [B,1,1,S]: 0 = attend, very
                    # negative = masked (make_attention_bias)
                    key_mask = bias[:, 0, 0, :] >= -1.0
                ctx = ring_attention_sharded(
                    q, k, v, mesh, axis="model", key_mask=key_mask
                )
        if ctx is None:
            attn_rng = None
            if not deterministic and cfg.attention_probs_dropout_prob > 0.0:
                attn_rng = self.make_rng("dropout")
            ctx = dot_product_attention(
                q, k, v, bias=bias,
                dropout_rate=0.0 if deterministic
                else cfg.attention_probs_dropout_prob,
                dropout_rng=attn_rng,
                train=not deterministic,
            )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(
            hidden.shape[0], hidden.shape[1], cfg.hidden_size
        )

        out = _dense(cfg, cfg.hidden_size, "output_dense")(ctx)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic)
        out = ResidualLayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps,
            name="output_layer_norm",
        )(out, hidden)
        if return_kv:
            return out, own_kv
        return out


class FeedForward(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, hidden, deterministic=True):
        cfg = self.config
        x = _dense(cfg, cfg.intermediate_size, "intermediate_dense")(hidden)
        x = ACT2FN[cfg.hidden_act](x)
        x = _dense(cfg, cfg.hidden_size, "output_dense")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic)
        x = ResidualLayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps,
            name="output_layer_norm",
        )(x, hidden)
        return x


class TransformerLayer(nn.Module):
    config: TransformerConfig
    moe: bool = False

    @nn.compact
    def __call__(self, hidden, bias=None, deterministic=True,
                 prefix_kv=None, return_kv=False):
        attn = SelfAttention(self.config, name="attention")(
            hidden, bias=bias, deterministic=deterministic,
            prefix_kv=prefix_kv, return_kv=return_kv,
        )
        if return_kv:
            hidden, own_kv = attn
        else:
            hidden = attn
        cfg = self.config
        if self.moe and cfg.moe_experts > 0:
            from mmf_tpu.modules.moe import MoEFeedForward

            hidden = MoEFeedForward(
                num_experts=cfg.moe_experts,
                hidden_size=cfg.hidden_size,
                intermediate_size=cfg.intermediate_size,
                top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                activation=ACT2FN[cfg.hidden_act],
                layer_norm_eps=cfg.layer_norm_eps,
                dropout_rate=cfg.hidden_dropout_prob,
                dtype=cfg.dtype,
                name="moe_ffn",
            )(hidden, deterministic)
        else:
            hidden = FeedForward(self.config, name="ffn")(
                hidden, deterministic)
        if return_kv:
            return hidden, own_kv
        return hidden


class TransformerEncoder(nn.Module):
    """Stack of layers. Layers are unrolled (BERT-scale depth compiles
    fast and keeps per-layer names stable for checkpoint conversion)."""

    config: TransformerConfig
    num_layers: Optional[int] = None

    @nn.compact
    def __call__(self, hidden, bias=None, deterministic=True,
                 output_hidden_states=False, prefix_kvs=None,
                 return_kv=False):
        """``prefix_kvs``: per-layer cached (k, v) of loop-invariant
        prefix tokens (see SelfAttention); ``return_kv`` returns the
        per-layer (k, v) list alongside the output."""
        n = self.num_layers or self.config.num_hidden_layers
        if (
            self.config.pipeline_stages > 1
            and prefix_kvs is None and not return_kv
            and not output_hidden_states
            and not self.is_initializing()
        ):
            out = self._pipeline_forward(hidden, bias, deterministic, n)
            if out is not None:
                return out
        layer_cls = TransformerLayer
        if self.config.remat:
            policy = None
            if isinstance(self.config.remat, str):
                import jax

                policy = {
                    "full": None,
                    "dots": jax.checkpoint_policies.checkpoint_dots,
                    "dots_no_batch": (
                        jax.checkpoint_policies
                        .checkpoint_dots_with_no_batch_dims
                    ),
                }[self.config.remat]
            layer_cls = nn.remat(
                TransformerLayer, static_argnums=(3,), policy=policy
            )
        all_hidden = []
        all_kv = []
        for i in range(n):
            if output_hidden_states:
                all_hidden.append(hidden)
            moe = (
                self.config.moe_experts > 0
                and i % max(self.config.moe_every, 1)
                == max(self.config.moe_every, 1) - 1
            )
            layer = layer_cls(self.config, name=f"layer_{i}", moe=moe)
            if prefix_kvs is not None or return_kv:
                out = layer(
                    hidden, bias, deterministic,
                    prefix_kv=None if prefix_kvs is None else prefix_kvs[i],
                    return_kv=return_kv,
                )
                if return_kv:
                    hidden, kv = out
                    all_kv.append(kv)
                else:
                    hidden = out
            else:
                hidden = layer(hidden, bias, deterministic)
        if output_hidden_states:
            all_hidden.append(hidden)
            return hidden, all_hidden
        if return_kv:
            return hidden, all_kv
        return hidden

    def _pipeline_forward(self, hidden, bias, deterministic, n):
        """GPipe-style pipelined trunk (parallel/pipeline.py) over the
        mesh's ``model`` axis. Uses the SAME unrolled layer_i params —
        stacking into the [stages, layers_per_stage, ...] layout happens
        here inside the jitted step, so checkpoints and converted torch
        weights are untouched. Returns None to fall back to the unrolled
        loop when the configuration can't pipeline (with a logged
        reason — never silent)."""
        cfg = self.config
        from mmf_tpu.parallel import mesh as mesh_lib
        from mmf_tpu.parallel.pipeline import (
            pipeline_apply,
            pipeline_transformer_stage,
            trunk_pipeline_params,
        )

        stages = cfg.pipeline_stages
        mesh = mesh_lib.get_mesh()
        reason = None
        if cfg.moe_experts > 0:
            reason = "pipeline_stages with moe_experts is unsupported"
        elif mesh.shape.get("model", 1) != stages:
            reason = (
                f"pipeline_stages={stages} but the mesh's model axis is "
                f"{mesh.shape.get('model', 1)} (set distributed.mesh.model "
                f"= pipeline_stages)"
            )
        elif n % stages != 0:
            reason = f"{n} layers not divisible into {stages} stages"
        else:
            m = cfg.pipeline_microbatches or stages
            batch_axis = (
                "data"
                if "data" in mesh.axis_names and mesh.shape["data"] > 1
                else None
            )
            dp = mesh.shape[batch_axis] if batch_axis else 1
            if hidden.shape[0] % (m * dp) != 0:
                reason = (
                    f"batch {hidden.shape[0]} not divisible by "
                    f"{m} microbatches x {dp} data shards"
                )
        if reason is not None:
            _warn_once(f"pipeline disabled: {reason}; running unrolled")
            return None

        params = self.variables["params"]
        stacked = trunk_pipeline_params(params, stages)
        layer_module = TransformerLayer(cfg)
        if bias is None:
            bias = jnp.zeros(
                (hidden.shape[0], 1, 1, hidden.shape[1]), cfg.dtype
            )
        extras = [bias]
        needs_rng = not deterministic and (
            cfg.hidden_dropout_prob > 0.0
            or cfg.attention_probs_dropout_prob > 0.0
        )
        if needs_rng:
            base = self.make_rng("dropout")
            # one key per (data shard, microbatch): rows of a microbatch
            # block share that microbatch's key
            mb_keys = jax.random.split(base, dp * m)
            key_data = jax.random.key_data(mb_keys)  # [dp*M, key_size]
            mb = hidden.shape[0] // (dp * m)
            extras.append(jnp.repeat(key_data, mb, axis=0))  # [B, ...]
        stage_fn = pipeline_transformer_stage(
            layer_module, deterministic, with_rng=needs_rng, axis="model"
        )
        return pipeline_apply(
            stage_fn, stacked, hidden, mesh, axis="model",
            num_microbatches=m, extras=tuple(extras),
            batch_axis=batch_axis,
        )


class TextEmbeddings(nn.Module):
    """BERT word/position/token-type embeddings + LN + dropout."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None, deterministic=True):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size,
                embedding_init=nn.initializers.normal(cfg.initializer_range),
                param_dtype=jnp.float32, dtype=cfg.dtype,
                name="word_embeddings",
            )(input_ids.astype(jnp.int32))
            inputs_embeds = apply_padding_idx(
                inputs_embeds, input_ids, cfg.pad_token_id
            )
        seq_len = inputs_embeds.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(seq_len)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32, dtype=cfg.dtype,
            name="position_embeddings",
        )(position_ids.astype(jnp.int32))
        if token_type_ids is None:
            token_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
        typ = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32, dtype=cfg.dtype,
            name="token_type_embeddings",
        )(token_type_ids.astype(jnp.int32))
        x = inputs_embeds + pos + typ
        x = ResidualLayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps, name="layer_norm",
        )(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic)
        return x


class Pooler(nn.Module):
    """CLS pooler: dense + tanh."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, hidden):
        first = hidden[:, 0]
        return nn.tanh(_dense(self.config, self.config.hidden_size, "dense")(first))


class TransformerModel(nn.Module):
    """Full BERT-style model: embeddings -> encoder -> pooler."""

    config: TransformerConfig
    add_pooling_layer: bool = True

    @nn.compact
    def __call__(self, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, deterministic=True):
        cfg = self.config
        x = TextEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, position_ids, inputs_embeds,
            deterministic,
        )
        bias = None
        if attention_mask is not None:
            bias = make_attention_bias(attention_mask, cfg.dtype)
        x = TransformerEncoder(cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )
        pooled = None
        if self.add_pooling_layer:
            pooled = Pooler(cfg, name="pooler")(x)
        return x, pooled


class PredictionHeadTransform(nn.Module):
    """dense + act + LN (BertPredictionHeadTransform)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        x = _dense(cfg, cfg.hidden_size, "dense")(hidden)
        x = ACT2FN[cfg.hidden_act](x)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=jnp.float32, name="layer_norm",
        )(x)
        return x


class MLMHead(nn.Module):
    """Masked-LM head: transform + decoder to vocab (optionally tied)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, hidden, shared_embedding=None):
        cfg = self.config
        x = PredictionHeadTransform(cfg, name="transform")(hidden)
        if shared_embedding is not None:
            logits = x @ shared_embedding.T.astype(cfg.dtype)
            bias = self.param(
                "bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32
            )
            logits = logits + bias.astype(cfg.dtype)
        else:
            logits = nn.Dense(
                cfg.vocab_size, dtype=cfg.dtype, param_dtype=jnp.float32,
                name="decoder",
            )(x)
        return logits
