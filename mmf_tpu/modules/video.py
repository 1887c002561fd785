"""TPU-native video trunks behind the ``pytorchvideo`` encoder surface.

The reference's ``pytorchvideo`` encoder (mmf/modules/encoders.py:704-786)
wraps torch-hub pytorchvideo models behind a config surface
(model_name / random_init / drop_last_n_layers / pooler_name). Here the
same registry key dispatches to flax implementations designed for the
MXU (channel-last conv layouts, bf16-friendly, static shapes):

- ``slowfast_r50``: two-pathway 3D ResNet-50 with fast->slow lateral
  fusion (SlowFast, arXiv:1812.03982). Input ``[slow, fast]`` clips
  ([B,3,8,S,S] + [B,3,32,S,S], channel-first like the reference);
  output [B, 2304] pooled features.
- ``slow_r50``: the slow pathway alone; [B, 2048].
- ``mvit_base_32x3`` / ``mvit_base_16x4``: Multiscale Vision
  Transformer (arXiv:2104.11227) with space-time pooling attention;
  output [B, THW'+1, 768] tokens (pooler cls/avg/identity applies).

Weights are random-init (torch hub is unavailable; zoo conversion can
target these param trees later). Shape contract matches the reference's
tests/modules/test_encoders.py:110-165.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.modules.encoders import Encoder


def _to_bthwc(x):
    """[B,C,T,H,W] (torch video layout) -> [B,T,H,W,C] (conv layout)."""
    if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        return jnp.transpose(x, (0, 2, 3, 4, 1))
    return x


def _same_pad(kernel: Sequence[int]):
    return [(k // 2, k // 2) for k in kernel]


class Bottleneck3D(nn.Module):
    """ResNet-50 bottleneck with a configurable temporal kernel on the
    first 1x1 conv (the SlowFast recipe: temporal conv lives there)."""

    channels: int  # bottleneck width; output is 4x
    temporal_kernel: int = 1
    spatial_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_c = self.channels * 4
        tk = self.temporal_kernel
        s = self.spatial_stride
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, name=name
        )

        h = nn.Conv(self.channels, (tk, 1, 1), padding=_same_pad((tk, 1, 1)),
                    use_bias=False, name="conv_a")(x)
        h = nn.relu(norm("bn_a")(h))
        h = nn.Conv(self.channels, (1, 3, 3), strides=(1, s, s),
                    padding=_same_pad((1, 3, 3)), use_bias=False,
                    name="conv_b")(h)
        h = nn.relu(norm("bn_b")(h))
        h = nn.Conv(out_c, (1, 1, 1), use_bias=False, name="conv_c")(h)
        h = norm("bn_c")(h)

        if x.shape[-1] != out_c or s != 1:
            x = nn.Conv(out_c, (1, 1, 1), strides=(1, s, s), use_bias=False,
                        name="proj")(x)
            x = norm("bn_proj")(x)
        return nn.relu(x + h)


class ResStage3D(nn.Module):
    """A stack of Bottleneck3D blocks (one ResNet stage)."""

    blocks: int
    channels: int
    temporal_kernel: int = 1
    spatial_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.blocks):
            x = Bottleneck3D(
                self.channels,
                temporal_kernel=self.temporal_kernel,
                spatial_stride=self.spatial_stride if i == 0 else 1,
                name=f"block{i}",
            )(x, train)
        return x


class SlowFastR50(nn.Module):
    """Two-pathway SlowFast-R50 trunk. alpha=4 (8 vs 32 frames),
    beta=1/8 channel ratio, fusion conv kernel 7 stride alpha."""

    alpha: int = 4
    beta_inv: int = 8
    fusion_ratio: int = 2

    STAGE_BLOCKS = (3, 4, 6, 3)
    SLOW_TEMPORAL = (1, 1, 3, 3)  # temporal kernels per slow stage
    FAST_TEMPORAL = (3, 3, 3, 3)

    @nn.compact
    def __call__(self, clips, train: bool = False):
        assert isinstance(clips, (list, tuple)) and len(clips) == 2, (
            "slowfast_r50 expects [slow, fast] clips"
        )
        slow, fast = (_to_bthwc(c) for c in clips)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, name=name
        )

        # stems: slow (1,7,7)/64, fast (5,7,7)/8, spatial stride 2 + pool 2
        def stem(x, c, tk, name):
            x = nn.Conv(c, (tk, 7, 7), strides=(1, 2, 2),
                        padding=_same_pad((tk, 7, 7)), use_bias=False,
                        name=f"{name}_conv")(x)
            x = nn.relu(norm(f"{name}_bn")(x))
            return nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                               padding=_same_pad((1, 3, 3)))

        fast_c = 64 // self.beta_inv
        slow = stem(slow, 64, 1, "slow_stem")
        fast = stem(fast, fast_c, 5, "fast_stem")

        def fuse(slow, fast, idx):
            """Fast->slow lateral: strided temporal conv then concat."""
            lat = nn.Conv(
                fast.shape[-1] * self.fusion_ratio, (7, 1, 1),
                strides=(self.alpha, 1, 1), padding=_same_pad((7, 1, 1)),
                use_bias=False, name=f"fuse{idx}_conv",
            )(fast)
            lat = nn.relu(norm(f"fuse{idx}_bn")(lat))
            return jnp.concatenate([slow, lat], axis=-1)

        slow = fuse(slow, fast, 0)
        widths = (64, 128, 256, 512)
        for i in range(4):
            stride = 1 if i == 0 else 2
            slow = ResStage3D(
                self.STAGE_BLOCKS[i], widths[i],
                temporal_kernel=self.SLOW_TEMPORAL[i],
                spatial_stride=stride, name=f"slow_stage{i + 1}",
            )(slow, train)
            fast = ResStage3D(
                self.STAGE_BLOCKS[i], widths[i] // self.beta_inv,
                temporal_kernel=self.FAST_TEMPORAL[i],
                spatial_stride=stride, name=f"fast_stage{i + 1}",
            )(fast, train)
            if i < 3:
                slow = fuse(slow, fast, i + 1)

        # head pooling: global average per pathway, concat -> 2048+256
        slow = slow.mean(axis=(1, 2, 3))
        fast = fast.mean(axis=(1, 2, 3))
        return jnp.concatenate([slow, fast], axis=-1)


class SlowR50(nn.Module):
    """The slow pathway alone (Slow-only R50); [B, 2048] pooled."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = x[0]
        x = _to_bthwc(x)
        x = nn.Conv(64, (1, 7, 7), strides=(1, 2, 2),
                    padding=_same_pad((1, 7, 7)), use_bias=False,
                    name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="stem_bn")(x))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=_same_pad((1, 3, 3)))
        for i, (blocks, width, tk) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512), (1, 1, 3, 3))
        ):
            x = ResStage3D(
                blocks, width, temporal_kernel=tk,
                spatial_stride=1 if i == 0 else 2, name=f"stage{i + 1}",
            )(x, train)
        return x.mean(axis=(1, 2, 3))


class MultiScaleAttention(nn.Module):
    """MViT pooling attention: q/k/v each optionally pooled by a
    depthwise space-time conv (heads folded into batch), attention over
    the pooled sequences; cls token bypasses pooling."""

    dim: int
    num_heads: int
    q_stride: Tuple[int, int, int]
    kv_stride: Tuple[int, int, int]
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)

    @nn.compact
    def __call__(self, x, thw):
        B, N, C = x.shape
        heads = self.num_heads
        head_dim = C // heads
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        def pool(t, stride, name):
            if tuple(stride) == (1, 1, 1):
                return t, thw
            T, H, W = thw
            cls_tok, spatial = t[:, :, :1], t[:, :, 1:]
            s = spatial.reshape(B * heads, T, H, W, head_dim)
            s = nn.Conv(
                head_dim, self.pool_kernel, strides=tuple(stride),
                padding=_same_pad(self.pool_kernel),
                feature_group_count=head_dim, use_bias=False, name=name,
            )(s)
            new_thw = s.shape[1:4]
            s = s.reshape(B, heads, -1, head_dim)
            out = jnp.concatenate([cls_tok, s], axis=2)
            out = nn.LayerNorm(epsilon=1e-6, name=f"{name}_norm")(out)
            return out, new_thw

        q, q_thw = pool(q, self.q_stride, "pool_q")
        k, _ = pool(k, self.kv_stride, "pool_k")
        v, _ = pool(v, self.kv_stride, "pool_v")

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(head_dim)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, C)
        return nn.Dense(C, name="proj")(out), q_thw


class MultiScaleBlock(nn.Module):
    """One MViT block: pooled attention (+ max-pool skip), MLP with
    optional dim expansion (the multiscale transition)."""

    dim: int
    dim_out: int
    num_heads: int
    q_stride: Tuple[int, int, int]
    kv_stride: Tuple[int, int, int]
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, thw):
        B, N, C = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h, new_thw = MultiScaleAttention(
            self.dim, self.num_heads, self.q_stride, self.kv_stride,
            self.pool_kernel, name="attn",
        )(h, thw)

        if tuple(self.q_stride) != (1, 1, 1):
            # skip path pools with max-pool at the q stride
            T, H, W = thw
            cls_tok, spatial = x[:, :1], x[:, 1:]
            s = spatial.reshape(B, T, H, W, C)
            s = nn.max_pool(
                s, self.pool_kernel, strides=tuple(self.q_stride),
                padding=_same_pad(self.pool_kernel),
            )
            x = jnp.concatenate([cls_tok, s.reshape(B, -1, C)], axis=1)
        x = x + h

        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        mlp = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        from mmf_tpu.modules.transformer import ACT2FN

        mlp = nn.Dense(self.dim_out, name="mlp_fc2")(ACT2FN["gelu"](mlp))
        if self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, name="proj")(h)
        return x + mlp, new_thw


class MViT(nn.Module):
    """Multiscale ViT trunk (MViT-B); returns [B, THW'+1, C_final]."""

    spatial_size: int = 224
    temporal_size: int = 8
    embed_dim: int = 96
    num_heads: int = 1
    depth: int = 16
    patch_kernel: Tuple[int, int, int] = (3, 7, 7)
    patch_stride: Tuple[int, int, int] = (2, 4, 4)
    embed_dim_mul: Any = ((1, 2.0), (3, 2.0), (14, 2.0))
    atten_head_mul: Any = ((1, 2.0), (3, 2.0), (14, 2.0))
    pool_q_stride_size: Any = ((1, 1, 2, 2), (3, 1, 2, 2), (14, 1, 2, 2))
    pool_kv_stride_adaptive: Any = (1, 8, 8)
    pool_kvq_kernel: Any = (3, 3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _to_bthwc(x)
        x = nn.Conv(
            self.embed_dim, self.patch_kernel, strides=self.patch_stride,
            padding=_same_pad(self.patch_kernel), name="patch_embed",
        )(x)
        B, T, H, W, C = x.shape
        thw = (T, H, W)
        x = x.reshape(B, T * H * W, C)

        # separate space/time positional embeddings + cls (MViT-B setting)
        pos_s = self.param("pos_embed_spatial",
                           nn.initializers.normal(0.02), (1, H * W, C))
        pos_t = self.param("pos_embed_temporal",
                           nn.initializers.normal(0.02), (1, T, C))
        pos_cls = self.param("pos_embed_class",
                             nn.initializers.normal(0.02), (1, 1, C))
        x = x + (jnp.tile(pos_s, (1, T, 1))
                 + jnp.repeat(pos_t, H * W, axis=1))
        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, 1, C))
        cls_tok = jnp.broadcast_to(cls_tok, (B, 1, C)) + pos_cls
        x = jnp.concatenate([cls_tok, x], axis=1)

        dim_mul = {int(i): m for i, m in self.embed_dim_mul}
        head_mul = {int(i): m for i, m in self.atten_head_mul}
        q_strides = {int(s[0]): tuple(s[1:]) for s in self.pool_q_stride_size}

        dim, heads = self.embed_dim, self.num_heads
        kv_stride = list(self.pool_kv_stride_adaptive)
        for i in range(self.depth):
            heads = int(heads * head_mul.get(i, 1.0))
            dim_out = int(dim * dim_mul.get(i, 1.0))
            q_stride = q_strides.get(i, (1, 1, 1))
            # adaptive kv stride shrinks as q pools the grid, keeping kv
            # resolution constant
            this_kv = tuple(max(1, int(k)) for k in kv_stride)
            if q_stride != (1, 1, 1):
                kv_stride = [
                    max(1, k // s) for k, s in zip(kv_stride, q_stride)
                ]
            x, thw = MultiScaleBlock(
                dim, dim_out, heads, q_stride, this_kv,
                tuple(self.pool_kvq_kernel), name=f"block{i}",
            )(x, thw)
            dim = dim_out
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


_MVIT_PRESETS = {
    "mvit_base_32x3": {"temporal_size": 8},
    "mvit_base_16x4": {"temporal_size": 4},
}


@registry.register_encoder("pytorchvideo")
class PytorchVideoEncoder(Encoder):
    """Config-surface-compatible video encoder
    (reference encoders.py:704-786): ``model_name`` selects a flax trunk,
    ``pooler_name`` a registered pooler. ``random_init`` and
    ``drop_last_n_layers`` are accepted for config parity (weights are
    always random here and trunks expose features, not logits)."""

    model_name: str = "slowfast_r50"
    random_init: bool = True
    drop_last_n_layers: int = -1
    pooler_name: str = "identity"
    spatial_size: int = 224
    temporal_size: int = 8
    head: Any = None
    embed_dim_mul: Any = ((1, 2.0), (3, 2.0), (14, 2.0))
    atten_head_mul: Any = ((1, 2.0), (3, 2.0), (14, 2.0))
    pool_q_stride_size: Any = ((1, 1, 2, 2), (3, 1, 2, 2), (14, 1, 2, 2))
    pool_kv_stride_adaptive: Any = (1, 8, 8)
    pool_kvq_kernel: Any = (3, 3, 3)

    @property
    def out_dim(self):
        if self.model_name == "slowfast_r50":
            return 2304
        if self.model_name == "slow_r50":
            return 2048
        return 768

    @nn.compact
    def __call__(self, x, train: bool = False, *a, **k):
        if self.model_name == "slowfast_r50":
            out = SlowFastR50(name="trunk")(x, train)
        elif self.model_name == "slow_r50":
            out = SlowR50(name="trunk")(x, train)
        elif self.model_name in _MVIT_PRESETS:
            preset = _MVIT_PRESETS[self.model_name]
            out = MViT(
                spatial_size=self.spatial_size,
                temporal_size=preset.get(
                    "temporal_size", self.temporal_size
                ),
                embed_dim_mul=self.embed_dim_mul,
                atten_head_mul=self.atten_head_mul,
                pool_q_stride_size=self.pool_q_stride_size,
                pool_kv_stride_adaptive=self.pool_kv_stride_adaptive,
                pool_kvq_kernel=self.pool_kvq_kernel,
                name="trunk",
            )(x, train)
        else:
            raise ValueError(
                f"Unsupported pytorchvideo model_name "
                f"'{self.model_name}'; available: slowfast_r50, slow_r50, "
                f"{', '.join(_MVIT_PRESETS)}"
            )
        pooler = registry.get_pool_class(self.pooler_name)()
        return pooler(out)
