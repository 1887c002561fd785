"""Encoders (parity with mmf/modules/encoders.py).

Registered: finetune_faster_rcnn_fpn_fc7, identity, resnet152,
torchvision_resnet, frcnn (stub over models/frcnn), text_embedding,
transformer, vit; factories ImageFeatureEncoderFactory/ImageEncoderFactory/
TextEncoderFactory keep the reference's config contract. Video/audio
encoders (pytorchvideo, r2plus1d_18, resnet18_audio) are registered but
raise with a clear message — their backbones are not available in this
environment (torchvision/pytorchvideo absent).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.modules.embeddings import ImageFinetune, ProjectionEmbedding
from mmf_tpu.modules.resnet import ResNet


def adaptive_pool_2d(x, out_hw, pool_type="avg"):
    """Adaptive avg/max pool, NHWC -> [B, oh, ow, C] (torch semantics)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        hs, he = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            ws, we = (j * w) // ow, -(-((j + 1) * w) // ow)
            patch = x[:, hs:he, ws:we, :]
            red = patch.mean(axis=(1, 2)) if pool_type == "avg" else patch.max(
                axis=(1, 2)
            )
            cols.append(red)
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class Encoder(nn.Module):
    """Base encoder (reference encoders.py:44-57)."""

    @classmethod
    def from_params(cls, **kwargs):
        return cls(**kwargs)


@registry.register_encoder("identity")
class IdentityEncoder(Encoder):
    in_dim: int = 100

    @property
    def out_dim(self):
        return self.in_dim

    @nn.compact
    def __call__(self, x, *a, **k):
        return x


@registry.register_encoder("finetune_faster_rcnn_fpn_fc7")
class FinetuneFasterRcnnFpnFc7(Encoder):
    """fc6 -> fc7 finetune over region features (reference encoders.py:116).
    fc7 weights come from the pretrained pickle via the weight loader."""

    in_dim: int = 2048
    weights_file: Optional[str] = None
    bias_file: Optional[str] = None
    model_data_dir: Optional[str] = None

    @property
    def out_dim(self):
        return 2048

    @nn.compact
    def __call__(self, image_feat, *a, **k):
        return ImageFinetune(
            self.in_dim, self.weights_file, self.bias_file, name="module"
        )(image_feat)


@registry.register_encoder("resnet152")
class ResNet152ImageEncoder(Encoder):
    """Grid features from ResNet-152: Bx3x224x224 -> BxNx2048
    (reference encoders.py:246-290)."""

    pretrained: bool = True
    pool_type: str = "avg"
    num_output_features: int = 1

    @property
    def out_dim(self):
        return 2048

    @nn.compact
    def __call__(self, x, train=False):
        feats = ResNet(depth=152, features_only=True, name="model")(x, train)
        n = self.num_output_features
        if n == -1:
            pooled = feats
        else:
            shape = {1: (1, 1), 2: (2, 1), 3: (3, 1), 4: (2, 2), 5: (5, 1),
                     6: (3, 2), 7: (7, 1), 8: (4, 2), 9: (3, 3)}[n]
            pooled = adaptive_pool_2d(feats, shape, self.pool_type)
        b = pooled.shape[0]
        return pooled.reshape(b, -1, pooled.shape[-1])  # B x N x 2048


@registry.register_encoder("torchvision_resnet")
class TorchvisionResNetImageEncoder(Encoder):
    """Generic ResNet encoder (reference encoders.py:291-372)."""

    name: str = "resnet50"
    pretrained: bool = False
    zero_init_residual: bool = True
    num_output_features: int = -1
    pool_type: str = "avg"

    @property
    def out_dim(self):
        depth = int("".join(ch for ch in self.name if ch.isdigit()) or 50)
        return 512 if depth in (18, 34) else 2048

    @nn.compact
    def __call__(self, x, train=False):
        depth = int("".join(ch for ch in self.name if ch.isdigit()) or 50)
        feats = ResNet(depth=depth, features_only=True, name="model")(x, train)
        n = self.num_output_features
        b = feats.shape[0]
        if n == -1:
            return feats.reshape(b, -1, feats.shape[-1])
        shape = {1: (1, 1), 2: (2, 1), 3: (3, 1), 4: (2, 2), 5: (5, 1),
                 6: (3, 2), 7: (7, 1), 8: (4, 2), 9: (3, 3)}[n]
        pooled = adaptive_pool_2d(feats, shape, self.pool_type)
        return pooled.reshape(b, -1, pooled.shape[-1])


@registry.register_encoder("text_embedding")
class TextEmbeddingEncoder(Encoder):
    """(reference encoders.py:482-512)"""

    operator: str = "sum"
    embedding_params: Any = None

    @nn.compact
    def __call__(self, x):
        from mmf_tpu.modules.embeddings import TextEmbedding

        p = dict(self.embedding_params or {})
        x = TextEmbedding(
            p.get("type", "vocab"), p.get("params", {}), name="module"
        )(x)
        if self.operator == "sum":
            return x.sum(axis=1)
        if self.operator == "concat":
            return x.reshape(x.shape[0], -1)
        if self.operator == "mul":
            return jnp.prod(x, axis=1)
        return x


@registry.register_encoder("transformer")
class TransformerEncoderWrapper(Encoder):
    """BERT-style text encoder (reference encoders.py:513-586). Uses the
    in-repo trunk; ``num_segments`` expands the type-embedding table."""

    bert_model_name: str = "bert-base-uncased"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    num_segments: Optional[int] = None
    output_attentions: bool = False
    output_hidden_states: bool = False
    random_init: bool = False
    dtype: Any = jnp.float32

    @property
    def out_dim(self):
        return self.hidden_size

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True, return_sequence=False):
        from mmf_tpu.modules.transformer import (
            TransformerConfig,
            TransformerModel,
        )

        cfg = TransformerConfig(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.hidden_size * 4,
            max_position_embeddings=self.max_position_embeddings,
            type_vocab_size=self.num_segments or self.type_vocab_size,
            dtype=self.dtype,
        )
        seq, pooled = TransformerModel(cfg, name="module")(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
        )
        return seq if return_sequence else pooled


@registry.register_encoder("vit")
class ViTEncoder(Encoder):
    """(reference encoders.py:830-857 over modules/vit.py)"""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    patch_size: int = 16
    image_size: int = 224
    random_init: bool = True
    gradient_checkpointing: bool = False
    do_patch_embeddings: bool = True
    dtype: Any = jnp.float32

    @property
    def out_dim(self):
        return self.hidden_size

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic=True):
        from mmf_tpu.modules.vit import ViTModel

        seq, pooled = ViTModel(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            patch_size=self.patch_size,
            image_size=self.image_size,
            do_patch_embeddings=self.do_patch_embeddings,
            dtype=self.dtype,
            name="module",
        )(x, attention_mask, deterministic)
        return seq, pooled


@registry.register_encoder("frcnn")
class FRCNNImageEncoder(Encoder):
    """On-the-fly region features via the in-repo FRCNN
    (reference encoders.py:410-481). Heavy; see models/frcnn."""

    in_dim: int = 3

    @nn.compact
    def __call__(self, x, *a, **k):
        raise NotImplementedError(
            "frcnn encoder requires the GeneralizedRCNN port "
            "(mmf_tpu/models/frcnn.py); use precomputed features instead"
        )


def _unavailable_encoder(name: str, reason: str):
    @registry.register_encoder(name)
    class _Unavailable(Encoder):  # noqa: N801
        @nn.compact
        def __call__(self, *a, **k):
            raise NotImplementedError(
                f"Encoder '{name}' is unavailable in this environment: "
                f"{reason}"
            )

    _Unavailable.__name__ = f"Unavailable_{name}"
    return _Unavailable


# gated: backbone libraries not present in this image
_unavailable_encoder("pytorchvideo", "pytorchvideo is not installed")
_unavailable_encoder("r2plus1d_18", "torchvision video models not installed")
_unavailable_encoder("resnet18_audio", "audio backbone not ported yet")
_unavailable_encoder("detectron2_resnet", "detectron2 is not installed")


class PooledEncoder(nn.Module):
    """Encode then pool to k vectors (reference encoders.py:649-703)."""

    encoder: Any
    num_output_features: int = 1
    pool_type: str = "avg"
    out_dim: int = 768
    three_d: bool = False

    @nn.compact
    def __call__(self, x, *a, **k):
        out = self.encoder(x, *a, **k)
        if isinstance(out, tuple):
            out = out[0]
        # pool over the token axis to num_output_features
        b, s, d = out.shape
        n = self.num_output_features
        chunk = s // n
        out = out[:, : chunk * n].reshape(b, n, chunk, d)
        return out.mean(axis=2) if self.pool_type == "avg" else out.max(axis=2)


class MultiModalEncoderBase(nn.Module):
    """Builds modal + text encoders from config
    (reference encoders.py:588-648)."""

    config: Any = None

    def build_encoders(self):
        cfg = self.config or {}
        modal_cfg = cfg.get("modal_encoder", {}) or {}
        text_cfg = cfg.get("text_encoder", {}) or {}
        modal = build_image_encoder(modal_cfg, direct_features=cfg.get(
            "direct_features_input", False
        ))
        text = build_text_encoder(text_cfg)
        return modal, text


# ---------------------------------------------------------------------------
# factory helpers (reference utils/build.py: build_image_encoder etc.)
# ---------------------------------------------------------------------------
def build_image_encoder(config, direct_features: bool = False):
    etype = config.get("type", "resnet152")
    params = dict(config.get("params", {}) or {})
    if direct_features:
        # image-feature encoders operate on precomputed region features
        if etype in ("default", "identity"):
            return IdentityEncoder(in_dim=params.get("in_dim", 2048))
        if etype == "projection":
            params.setdefault("module", "linear")
            return ProjectionEmbedding(**params)
        if etype == "finetune_faster_rcnn_fpn_fc7":
            return FinetuneFasterRcnnFpnFc7(**params)
        raise NotImplementedError(f"Unknown Image Feature Encoder: {etype}")
    cls = registry.get_encoder_class(etype)
    if cls is None:
        raise NotImplementedError(f"Unknown Image Encoder: {etype}")
    fields = getattr(cls, "__dataclass_fields__", {})
    return cls(**{k: v for k, v in params.items() if k in fields})


def build_text_encoder(config):
    etype = config.get("type", "transformer")
    params = dict(config.get("params", {}) or {})
    cls = registry.get_encoder_class(etype)
    if cls is None:
        raise NotImplementedError(f"Unknown Text Encoder: {etype}")
    fields = getattr(cls, "__dataclass_fields__", {})
    return cls(**{k: v for k, v in params.items() if k in fields})
