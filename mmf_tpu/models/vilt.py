"""ViLT: patch-embedding single-stream transformer (no region features).

TPU-native reimplementation of the reference (mmf/models/vilt.py:283):
BERT-style text embeddings and ViT patch embeddings (each plus a modality
type embedding) are concatenated and run through a ViT encoder; per-task
heads (mlp/itm/mlm) come from the transformer-head registry via
build_heads_dict. ITM/MLM label inference mirrors the reference
(_infer_itm_labels/_infer_mlm_labels, vilt.py:168-283), with the MLM
second masked forward (_encode_mlm) included.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.models.transformers.base import build_heads_dict
from mmf_tpu.modules.transformer import TextEmbeddings, TransformerConfig
from mmf_tpu.modules.vit import ViTModel, ViTPatchEmbeddings


class ViLTImageEmbedding(nn.Module):
    """(reference vilt.py:22-79)"""

    hidden_size: int = 768
    patch_size: int = 16
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, deterministic=True):
        if image.ndim == 5:
            b, n = image.shape[0], image.shape[1]
            image = image.reshape((b * n,) + image.shape[2:])
        emb = ViTPatchEmbeddings(
            self.hidden_size, self.patch_size, self.image_size, self.dtype,
            name="embedding",
        )(image, deterministic)
        type_emb = nn.Embed(2, self.hidden_size,
                            name="token_type_embeddings")(
            jnp.ones(emb.shape[:2], jnp.int32)
        )
        return emb + type_emb


class ViLTTextEmbedding(nn.Module):
    """(reference vilt.py:82-115)"""

    hidden_size: int = 768
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, segment_ids, deterministic=True):
        cfg = TransformerConfig.from_dict(
            {
                "hidden_size": self.hidden_size,
                "vocab_size": self.vocab_size,
                "max_position_embeddings": self.max_position_embeddings,
                "dtype": self.dtype,
            }
        )
        emb = TextEmbeddings(cfg, name="text_embeddings")(
            input_ids, segment_ids, deterministic=deterministic
        )
        # the official repo adds type embeddings twice (vilt.py:108-113)
        type_emb = nn.Embed(2, self.hidden_size,
                            name="token_type_embeddings")(
            segment_ids.astype(jnp.int32)
        )
        return emb + type_emb


@registry.register_model("vilt")
class ViLT(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/vilt/defaults.yaml"

    def get_weight_decay_mask(self, config=None):
        """Bias/LayerNorm exempt from weight decay (reference
        vilt.py:187-195 bert-groups text_embeddings + heads). Applied
        model-wide here: the reference leaves the ViT encoder's and image
        embedding's bias/LN decayed at 0.01 in their plain groups — a
        deliberate simplification, documented rather than silent."""
        from mmf_tpu.utils.modeling import bert_no_decay_mask

        return bert_no_decay_mask()

    def _heads(self):
        head_configs = self.config.get("heads", {}) or {}
        tasks = self.config.get("tasks", None)
        if tasks is None:
            tasks = list(head_configs.keys()) if isinstance(
                head_configs, dict
            ) else []
        if isinstance(tasks, str):
            tasks = tasks.split(",")
        return build_heads_dict(head_configs, tasks,
                                losses=self.config.get("losses", {}))

    def _infer_itm_labels(self, sample_list):
        if "is_correct" in sample_list:
            is_correct = sample_list["is_correct"]
        else:
            is_correct = jnp.ones(
                sample_list["input_ids"].shape[0], jnp.int32
            )
        return {"is_correct": is_correct.astype(jnp.int32)}

    def _infer_mlm_labels(self, sample_list, image_token_len):
        if "lm_label_ids" in sample_list:
            text_labels = sample_list["lm_label_ids"]
        else:
            text_labels = jnp.full_like(sample_list["input_ids"], -1)
        img_labels = jnp.full(
            (text_labels.shape[0], image_token_len), -1, text_labels.dtype
        )
        return {
            "text": text_labels,
            "image": img_labels,
            "combined_labels": jnp.concatenate([text_labels, img_labels], -1),
        }

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        c = self.config
        deterministic = not train
        hidden = c.get("hidden_size", 768)
        img_params = (c.get("image_encoder", {}) or {}).get("params", {}) or {}
        image_size = img_params.get("image_size", [224, 224])
        if isinstance(image_size, (list, tuple)):
            image_size = image_size[0]

        te_cfg = dict(c.get("text_embeddings", {}) or {})
        text_embeddings = ViLTTextEmbedding(
            hidden_size=hidden,
            vocab_size=te_cfg.get("vocab_size", c.get("vocab_size", 30522)),
            max_position_embeddings=te_cfg.get(
                "max_position_embeddings",
                c.get("max_position_embeddings", 512),
            ),
            name="text_embeddings",
        )
        image_embeddings = ViLTImageEmbedding(
            hidden_size=hidden,
            patch_size=img_params.get("patch_size", 16),
            image_size=image_size,
            name="image_embeddings",
        )
        encoder = ViTModel(
            hidden_size=hidden,
            num_hidden_layers=c.get("num_hidden_layers", 12),
            num_attention_heads=c.get("num_attention_heads", 12),
            intermediate_size=img_params.get("mlp_dim", hidden * 4),
            do_patch_embeddings=False,
            add_pooling_layer=False,
            name="encoder",
        )
        # heads are plain module instances; calling them inside this compact
        # scope registers their params as children (deterministic order)
        heads_dict = self._heads()

        text_embedding = text_embeddings(
            sample_list["input_ids"], sample_list["segment_ids"],
            deterministic,
        )
        image_embedding = image_embeddings(sample_list["image"], deterministic)

        sl = dict(sample_list)
        heads_for_ds = heads_dict.names_for(sl.get("dataset_name", "unknown"))
        head_string = " ".join(heads_for_ds)
        if "itm" in head_string:
            sl["itm_labels"] = self._infer_itm_labels(sample_list)
        if "mlm" in head_string:
            sl["mlm_labels"] = self._infer_mlm_labels(
                sample_list, image_embedding.shape[1]
            )

        embeddings = jnp.concatenate([text_embedding, image_embedding], 1)
        text_mask = sample_list.get(
            "input_mask", jnp.ones(text_embedding.shape[:2], jnp.int32)
        )
        image_mask = sample_list.get(
            "image_mask", jnp.ones(image_embedding.shape[:2], jnp.int32)
        )
        attention_mask = jnp.concatenate([text_mask, image_mask], axis=1)

        sequence, _ = encoder(embeddings, attention_mask, deterministic)

        if "mlm" in head_string:
            # second masked forward (reference vilt.py:270-283
            # _encode_mlm): the MLM loss must score a sequence encoded
            # from the MASKED ids — scoring the unmasked encode lets the
            # model read each target token from its own embedding and the
            # objective collapses. (We concatenate [text; image] like the
            # main forward; the reference's _encode_mlm flips the order
            # against its own [text; image] labels/mask — not replicated.)
            masked_ids = sample_list.get(
                "input_ids_masked", sample_list["input_ids"]
            )
            masked_text = text_embeddings(
                masked_ids, sample_list["segment_ids"], deterministic
            )
            masked_embeddings = jnp.concatenate(
                [masked_text, image_embedding], 1
            )
            masked_seq, _ = encoder(
                masked_embeddings, attention_mask, deterministic
            )
            sl["hs_masked_for_mlm"] = masked_seq

        outputs = heads_dict(
            sl.get("dataset_name", "unknown"), sequence, sl, deterministic
        )
        # namespace head losses like model-internal losses
        if "losses" in outputs:
            ds = sl.get("dataset_name", "unknown")
            dt = sl.get("dataset_type", "train")
            outputs["losses"] = {
                f"{dt}/{ds}/{k}": v for k, v in outputs["losses"].items()
            }
        return outputs
