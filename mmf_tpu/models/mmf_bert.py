"""MMFBert: BERT-ified Pythia (parity with mmf/models/mmf_bert.py:418).

Question through a BERT trunk; top-down attention over region features
conditioned on the pooled question; element-multiply fusion; classifier.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.pythia import Pythia
from mmf_tpu.modules.transformer import TransformerConfig, TransformerModel


@registry.register_model("mmf_bert")
class MMFBert(Pythia):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/mmf_bert/defaults.yaml"

    def _tcfg(self):
        c = self.config
        return TransformerConfig.from_dict(
            {
                "hidden_size": c.get("hidden_size", 768),
                "num_hidden_layers": c.get("num_hidden_layers", 12),
                "num_attention_heads": c.get("num_attention_heads", 12),
                "intermediate_size": c.get("intermediate_size", 3072),
                "vocab_size": c.get("vocab_size", 30522),
                "dtype": c.get("dtype", "float32"),
            }
        )

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train
        cfg = self._tcfg()
        seq, pooled = TransformerModel(cfg, name="bert")(
            sample_list["input_ids"],
            sample_list.get("input_mask"),
            sample_list.get("segment_ids"),
            deterministic=deterministic,
        )
        text_total = pooled
        image_total, _ = self._feature_embedding_total(
            "image", sample_list, text_total, deterministic
        )
        joint = self._combine(image_total, text_total, deterministic)
        scores = self._classify(joint, deterministic)
        return {"scores": scores}
