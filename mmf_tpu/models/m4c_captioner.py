"""M4C-Captioner: M4C without the question input
(parity with mmf/models/m4c_captioner.py:23)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.m4c import M4C


@registry.register_model("m4c_captioner")
class M4CCaptioner(M4C):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/m4c_captioner/defaults.yaml"

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        # remove_unk_in_pred is handled by the caption processor at
        # prediction time; the trunk ignores question text by zeroing it
        sl = dict(sample_list)
        if self.config.get("remove_text_input", True):
            sl["text"] = jnp.zeros_like(sl["text"])
            sl["text_len"] = jnp.zeros_like(sl["text_len"])
        return super().__call__(sl, train)
