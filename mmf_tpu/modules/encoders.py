"""Encoders (parity with mmf/modules/encoders.py).

Registered: finetune_faster_rcnn_fpn_fc7, identity, resnet152,
torchvision_resnet, frcnn (region features via models/frcnn),
text_embedding, transformer, vit, r2plus1d_18 (flax R(2+1)D video
encoder), resnet18_audio (spectrogram ResNet-18), detectron2_resnet
(caffe-lineage C4 grid features); factories keep the reference's config
contract. ``pytorchvideo`` is served by the flax video trunks in
modules/video.py (same config surface, no torch-hub dependency).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

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
    def __call__(self, x, *args, deterministic=True, **kwargs):
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
    """On-the-fly region features via the in-repo GeneralizedRCNN
    (reference encoders.py:410-481): NHWC/NCHW images -> [B, R, 2048]
    mean-pooled res5 region features (R = post_nms_topk, padded)."""

    in_dim: int = 3
    post_nms_topk: int = 100
    depth: int = 50

    @property
    def out_dim(self):
        return 2048

    @nn.compact
    def __call__(self, x, *a, **k):
        from mmf_tpu.models.frcnn import GeneralizedRCNN

        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = x.transpose(0, 2, 3, 1)
        shapes = jnp.tile(
            jnp.asarray(x.shape[1:3], jnp.float32)[None], (x.shape[0], 1)
        )
        out = GeneralizedRCNN(
            depth=self.depth, post_nms_topk=self.post_nms_topk,
            name="module",
        )(x, shapes)
        return out["roi_features"]


class _Conv2Plus1D(nn.Module):
    """Factorized 3D conv: spatial (1,k,k) then temporal (k,1,1) with a
    mid-channel bottleneck sized per the R(2+1)D paper (arXiv:1711.11248)."""

    out_channels: int
    mid_channels: int
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        st, sh, sw = self.stride
        x = nn.Conv(self.mid_channels, (1, 3, 3), strides=(1, sh, sw),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                    name="spatial")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn_mid")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 1, 1), strides=(st, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False,
                    name="temporal")(x)
        return x


def _r2plus1d_mid(in_c: int, out_c: int, t: int = 3, d: int = 3) -> int:
    return (t * d * d * in_c * out_c) // (d * d * in_c + t * out_c)


class _R2Plus1DBlock(nn.Module):
    out_channels: int
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train=False):
        in_c = x.shape[-1]
        residual = x
        y = _Conv2Plus1D(
            self.out_channels, _r2plus1d_mid(in_c, self.out_channels),
            self.stride, name="conv1",
        )(x, train)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = _Conv2Plus1D(
            self.out_channels,
            _r2plus1d_mid(self.out_channels, self.out_channels),
            name="conv2",
        )(y, train)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.out_channels, (1, 1, 1),
                               strides=self.stride, use_bias=False,
                               name="downsample")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


@registry.register_encoder("r2plus1d_18")
class R2Plus1D18VideoEncoder(Encoder):
    """R(2+1)D-18 video encoder (reference encoders.py:787-808 wraps the
    torchvision model; this is the architecture in flax). Accepts
    [B,T,C,H,W] or [B,C,T,H,W]; returns [B, N, 512] feature tokens."""

    pretrained: bool = False  # accepted for config compat; no zoo weights
    num_output_features: int = 1

    @property
    def out_dim(self):
        return 512

    @nn.compact
    def __call__(self, x, train=False, *a, **k):
        if x.shape[1] == 3 and x.shape[2] != 3:
            x = x.transpose(0, 2, 1, 3, 4)  # BCTHW -> BTCHW
        x = x.transpose(0, 1, 3, 4, 2)  # BTCHW -> BTHWC (conv layout)

        # stem: (2+1)D with 45 mid channels, spatial stride 2
        x = nn.Conv(45, (1, 7, 7), strides=(1, 2, 2),
                    padding=((0, 0), (3, 3), (3, 3)), use_bias=False,
                    name="stem_spatial")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    use_bias=False, name="stem_temporal")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn2")(x)
        x = nn.relu(x)

        for i, channels in enumerate((64, 128, 256, 512)):
            for j in range(2):
                stride = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                x = _R2Plus1DBlock(channels, stride,
                                   name=f"layer{i + 1}_{j}")(x, train)

        b = x.shape[0]
        tokens = x.reshape(b, -1, x.shape[-1])  # [B, T'*H'*W', 512]
        n = self.num_output_features
        if n == -1:
            return tokens
        s = tokens.shape[1]
        chunk = s // n
        return tokens[:, : chunk * n].reshape(b, n, chunk, -1).mean(axis=2)


@registry.register_encoder("resnet18_audio")
class ResNet18AudioEncoder(Encoder):
    """ResNet-18 over single-channel spectrograms
    (reference encoders.py:810-828); returns [B, N, 512] tokens."""

    pretrained: bool = False
    num_output_features: int = -1

    @property
    def out_dim(self):
        return 512

    @nn.compact
    def __call__(self, x, train=False, *a, **k):
        if x.ndim == 3:
            x = x[:, None]  # [B, H, W] -> [B, 1, H, W]
        feats = ResNet(depth=18, features_only=True, name="model")(x, train)
        b = feats.shape[0]
        tokens = feats.reshape(b, -1, feats.shape[-1])
        n = self.num_output_features
        if n == -1:
            return tokens
        s = tokens.shape[1]
        chunk = s // n
        return tokens[:, : chunk * n].reshape(b, n, chunk, -1).mean(axis=2)


@registry.register_encoder("detectron2_resnet")
class Detectron2ResnetImageEncoder(Encoder):
    """Caffe-lineage ResNet-C4 grid features (reference encoders.py:373-409
    wraps detectron2; this reuses the GeneralizedRCNN backbone stages):
    images -> [B, N, 1024] res4 tokens."""

    depth: int = 50
    pretrained: bool = False

    @property
    def out_dim(self):
        return 1024

    @nn.compact
    def __call__(self, x, *a, **k):
        from mmf_tpu.models.frcnn import _BLOCKS_PER_DEPTH, CaffeBottleneck, Stem

        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = x.transpose(0, 2, 3, 1)
        blocks = _BLOCKS_PER_DEPTH[self.depth]
        x = Stem(name="stem")(x)
        stage_specs = [
            (blocks[0], 64, 256, 1, "res2"),
            (blocks[1], 128, 512, 2, "res3"),
            (blocks[2], 256, 1024, 2, "res4"),
        ]
        for num, bott, out, first_stride, name in stage_specs:
            for j in range(num):
                x = CaffeBottleneck(
                    bottleneck_channels=bott, out_channels=out,
                    stride=first_stride if j == 0 else 1,
                    name=f"{name}_{j}",
                )(x)
        b = x.shape[0]
        return x.reshape(b, -1, x.shape[-1])


# NOTE: the "pytorchvideo" encoder key is registered by
# mmf_tpu/modules/video.py (flax video trunks behind the reference's
# config surface); setup_imports loads it alongside this module.


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
            fields = ProjectionEmbedding.__dataclass_fields__
            return ProjectionEmbedding(
                **{k: v for k, v in params.items() if k in fields}
            )
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
    if etype == "embedding":  # TextEncoderFactory alias
        etype = "text_embedding"
    params = dict(config.get("params", {}) or {})
    cls = registry.get_encoder_class(etype)
    if cls is None:
        raise NotImplementedError(f"Unknown Text Encoder: {etype}")
    fields = getattr(cls, "__dataclass_fields__", {})
    return cls(**{k: v for k, v in params.items() if k in fields})
