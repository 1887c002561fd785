"""ALBEF vision transformer (parity with mmf/models/albef/vit.py:522-667).

The reference vendors a timm-style ``VisionTransformer`` (pre-LN blocks,
fused-qkv attention, LayerNorm eps 1e-6, no pooler) and exposes it as the
``albef_vit_encoder`` registered encoder whose config carries the timm
parameter names (``embed_dim``/``depth``/``num_heads``/``mlp_ratio``/
``img_size``/``patch_size`` — vit.py:550-563).  We reuse the shared
pre-LN ViT trunk (modules/vit.py) — architecturally identical — and keep
the reference's parameter names and eps so configs written for the
reference resolve unchanged.  Golden parity:
tests/reference_parity/test_albef_vit_parity.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from mmf_tpu.common.registry import registry
from mmf_tpu.modules.vit import ViTModel


@registry.register_encoder("albef_vit_encoder")
class AlbefVitEncoder(nn.Module):
    # timm/reference parameter names (mmf/models/albef/vit.py:550-563)
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    img_size: int = 224
    patch_size: int = 16
    out_dim: int = 768
    dtype: Any = None

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic=True):
        seq, _ = ViTModel(
            hidden_size=self.embed_dim,
            num_hidden_layers=self.depth,
            num_attention_heads=self.num_heads,
            intermediate_size=int(self.embed_dim * self.mlp_ratio),
            patch_size=self.patch_size,
            image_size=self.img_size,
            layer_norm_eps=1e-6,  # timm default (vit.py:569), not BERT's 1e-12
            add_pooling_layer=False,
            name="vit",
        )(x, attention_mask, deterministic)
        return seq
