"""ALBEF vision transformer components
(parity with mmf/models/albef/vit.py:667): a ViT encoder variant used by
ALBEF-style models, exposed as a registered encoder over the shared
trunk."""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from mmf_tpu.common.registry import registry
from mmf_tpu.modules.vit import ViTModel


@registry.register_encoder("albef_vit_encoder")
class AlbefVitEncoder(nn.Module):
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    patch_size: int = 16
    image_size: int = 224
    dtype: Any = None

    @property
    def out_dim(self):
        return self.hidden_size

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic=True):
        seq, _ = ViTModel(
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            patch_size=self.patch_size,
            image_size=self.image_size,
            add_pooling_layer=False,
            name="vit",
        )(x, attention_mask, deterministic)
        return seq
