"""MMFTransformer (mmft): modality-config-driven generic transformer.

TPU-native reimplementation of the reference (mmf/models/mmf_transformer.py
:445 + transformers/backends/huggingface.py): each configured modality gets
token/position/segment embeddings projected into the trunk's hidden size;
embeddings concatenate into one sequence encoded by the shared trunk, and
registered transformer heads (mlp/mlm/itm/...) produce scores/losses.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.transformers.base import BaseTransformer, build_heads_dict
from mmf_tpu.modules.encoders import build_image_encoder
from mmf_tpu.modules.transformer import (
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import make_attention_bias


DEFAULT_MODALITIES = [
    {"type": "text", "key": "text", "position_dim": 512,
     "embedding_dim": 768, "segment_id": 0},
    {"type": "image", "key": "image", "embedding_dim": 2048,
     "position_dim": 1, "segment_id": 1,
     "encoder": {"type": "resnet152", "params": {}}},
]


@registry.register_model("mmf_transformer")
class MMFTransformer(BaseTransformer):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/mmf_transformer/defaults.yaml"

    @classmethod
    def format_state_key(cls, key: str) -> str:
        if key.startswith("pooler.") or key.startswith("classifier."):
            return key.replace("pooler.", "heads.0.pooler.").replace(
                "classifier.", "heads.0.classifier."
            )
        return key

    def _modalities(self) -> List[Dict[str, Any]]:
        return list(self.config.get("modalities", DEFAULT_MODALITIES))

    def _tcfg(self) -> TransformerConfig:
        return TransformerConfig.from_dict(
            {
                "hidden_size": self.config.get("hidden_size", 768),
                "num_hidden_layers": self.config.get("num_hidden_layers", 12),
                "num_attention_heads": self.config.get(
                    "num_attention_heads", 12
                ),
                "intermediate_size": self.config.get(
                    "intermediate_size",
                    self.config.get("hidden_size", 768) * 4,
                ),
                "vocab_size": self.config.get("vocab_size", 30522),
                "dtype": self.config.get("dtype", "float32"),
            }
        )

    # -- per-modality raw inputs (reference _infer_input_ids) -------------
    def _modality_input(self, modality, sample_list):
        key = modality["key"]
        mtype = modality["type"]
        if mtype == "text":
            if key in sample_list:
                return sample_list[key]
            return sample_list["input_ids"]
        # image / generic feature
        if "encoder" in modality and modality["encoder"] is not None and \
                mtype == "image" and key in sample_list and \
                sample_list[key].ndim == 4:
            encoder = build_image_encoder(modality["encoder"])
            return encoder(sample_list[key])
        if key in sample_list:
            x = sample_list[key]
        elif f"{key}_feature_0" in sample_list:
            x = sample_list[f"{key}_feature_0"]
        else:
            x = sample_list["image_feature_0"]
        if x.ndim == 2:
            x = x[:, None, :]
        return x

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        c = self.config
        deterministic = not train
        tcfg = self._tcfg()
        hidden = tcfg.hidden_size
        modalities = self._modalities()

        token_type_embeddings = nn.Embed(
            len(modalities) + 1, hidden, name="token_type_embeddings",
            embedding_init=nn.initializers.normal(0.02),
        )
        embeddings = []
        masks = []
        mlm_label_parts = []
        # first text modality's token table; MLM heads tie their decoder
        # to it (reference mmf_transformer.py:145-174 tie_weights)
        text_embedding_table = None
        for idx, modality in enumerate(modalities):
            key = modality["key"]
            mtype = modality["type"]
            raw = self._modality_input(modality, sample_list)

            if mtype == "text":
                tok_embed = nn.Embed(
                    tcfg.vocab_size, hidden, name=f"token_embeddings_{idx}",
                    embedding_init=nn.initializers.normal(0.02),
                )
                tok = tok_embed(raw.astype(jnp.int32))
                if text_embedding_table is None:
                    text_embedding_table = tok_embed.embedding
                seq_len = tok.shape[1]
                mask = sample_list.get(
                    "input_mask", jnp.ones(tok.shape[:2], jnp.int32)
                )
                labels = sample_list.get("lm_label_ids", None)
                mlm_label_parts.append(
                    labels if labels is not None
                    else jnp.full(tok.shape[:2], -1, jnp.int32)
                )
            else:
                # non-text modalities project through Linear + LayerNorm
                # (reference backends/huggingface.py:78-86: the token
                # embedding for features is Sequential(Linear, LayerNorm))
                ln_eps = modality.get("layer_norm_eps", 1e-12)
                tok = nn.Dense(hidden, name=f"token_proj_{idx}")(raw)
                tok = nn.LayerNorm(
                    epsilon=ln_eps, name=f"token_proj_ln_{idx}"
                )(tok)
                seq_len = tok.shape[1]
                mask_attr = f"{key}_mask"
                mask = sample_list.get(
                    mask_attr, jnp.ones(tok.shape[:2], jnp.int32)
                )
                mlm_label_parts.append(
                    jnp.full(tok.shape[:2], -1, jnp.int32)
                )

            pos_dim = modality.get("position_dim", 512)
            pos = nn.Embed(
                max(pos_dim, seq_len), hidden,
                name=f"pos_embeddings_{idx}",
                embedding_init=nn.initializers.normal(0.02),
            )(jnp.arange(seq_len)[None, :])
            seg_id = modality.get("segment_id", -1)
            emb = tok + pos
            if seg_id != -1:
                seg = token_type_embeddings(
                    jnp.full(tok.shape[:2], seg_id, jnp.int32)
                )
                emb = emb + seg
            emb = nn.LayerNorm(
                epsilon=modality.get("layer_norm_eps", 1e-12),
                name=f"layer_norm_{idx}",
            )(emb)
            emb = nn.Dropout(
                modality.get(
                    "hidden_dropout_prob", tcfg.hidden_dropout_prob
                )
            )(emb, deterministic)
            embeddings.append(emb)
            masks.append(mask)

        x = jnp.concatenate(embeddings, axis=1)
        attention_mask = jnp.concatenate(masks, axis=1)
        bias = make_attention_bias(attention_mask, tcfg.dtype)
        sequence = TransformerEncoder(tcfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )

        sl = dict(sample_list)
        sl["mlm_labels"] = {
            "combined_labels": jnp.concatenate(mlm_label_parts, axis=1)
        }
        sl.setdefault("itm_labels", {
            "is_correct": sl.get(
                "is_correct",
                jnp.ones(x.shape[0], jnp.int32),
            )
        })

        head_configs = c.get("heads", [{"type": "mlp",
                                        "num_labels": c.get("num_labels", 2)}])
        heads_dict = build_heads_dict(head_configs, tasks=[],
                                      losses=c.get("losses", {}))
        outputs: Dict[str, Any] = {"losses": {}}
        names = (
            heads_dict.names_for(sl.get("dataset_name", "unknown"))
            if isinstance(heads_dict.head_names, dict)
            else list(heads_dict.head_names)
        )
        tie = c.get("tie_weights", True)
        for name in names:
            head = heads_dict.heads[name]
            kwargs = {}
            if tie and text_embedding_table is not None and getattr(
                head, "ties_embeddings", False
            ):
                kwargs["shared_embedding"] = text_embedding_table
            out = head(
                sequence, processed_sample_list=sl,
                deterministic=deterministic, **kwargs,
            )
            for k, v in out.items():
                if k == "losses":
                    outputs["losses"].update(v)
                else:
                    outputs[k] = v
        if outputs["losses"]:
            ds = sl.get("dataset_name", "unknown")
            dt = sl.get("dataset_type", "train")
            outputs["losses"] = {
                f"{dt}/{ds}/{k}": v for k, v in outputs["losses"].items()
            }
        else:
            outputs.pop("losses")
        return outputs


# alias used by configs/tests in the reference
registry.register_model("mmft")(MMFTransformer)
