"""UNITER: single-stream joint V-L encoder with per-task heads
(parity with mmf/models/uniter.py:773).

Text embeddings + image-region embeddings (feature + 7-dim position box)
share one BERT trunk; pretraining samples a task per step from
{mlm, itm, mrc, mrfr, wra} (host-side choice — each task traces once and
is cached), classification dispatches per dataset.
"""

from __future__ import annotations

import random as _random
from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.models.transformers.base import build_head
from mmf_tpu.modules.transformer import (
    Pooler,
    TextEmbeddings,
    TransformerConfig,
    TransformerEncoder,
)
from mmf_tpu.ops.attention import make_attention_bias

DEFAULT_PRETRAINING_TASKS = "mlm,itm,mrc,mrfr,wra"


class UNITERImageEmbeddings(nn.Module):
    """Region feature + position embeddings (reference uniter.py:45-90)."""

    hidden_size: int = 768
    eps: float = 1e-12
    hidden_dropout_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img_feat, img_pos_feat, type_embeddings,
                 img_masks=None, deterministic=True):
        if img_masks is not None:
            # learned [MASK] row added on masked regions; same [2, img_dim]
            # table layout as the reference (whose row 0 is forced to zero
            # before the gather, uniter.py:78-81 — here the mask gates it)
            table = nn.Embed(
                2, img_feat.shape[-1],
                embedding_init=nn.initializers.normal(0.02),
                name="mask_embedding",
            )
            masks = img_masks.astype(jnp.int32)
            img_feat = img_feat + (
                table(masks) * masks[..., None].astype(img_feat.dtype)
            )
        im = nn.LayerNorm(
            epsilon=self.eps, name="img_layer_norm",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(
            nn.Dense(self.hidden_size, name="img_linear",
                     dtype=self.dtype, param_dtype=jnp.float32)(img_feat)
        )
        pos = nn.LayerNorm(
            epsilon=self.eps, name="pos_layer_norm",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(
            nn.Dense(self.hidden_size, name="pos_linear",
                     dtype=self.dtype, param_dtype=jnp.float32)(img_pos_feat)
        )
        emb = im + pos + type_embeddings
        emb = nn.LayerNorm(
            epsilon=self.eps, name="final_layer_norm",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(emb)
        return nn.Dropout(self.hidden_dropout_prob)(emb, deterministic)


class UNITERTextEmbeddings(nn.Module):
    """BERT word/pos/type embeddings with the token-type table exposed so
    the image stream can reuse it — the reference gathers image type
    embeddings from the TEXT embedding table
    (``self.text_embeddings.token_type_embeddings(img_type_ids)``,
    reference uniter.py:173): one tied table, not two."""

    cfg: TransformerConfig

    def setup(self):
        c = self.cfg
        init = nn.initializers.normal(c.initializer_range)
        self.word_embeddings = nn.Embed(
            c.vocab_size, c.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, dtype=c.dtype,
        )
        self.position_embeddings = nn.Embed(
            c.max_position_embeddings, c.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, dtype=c.dtype,
        )
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, embedding_init=init,
            param_dtype=jnp.float32, dtype=c.dtype,
        )
        self.layer_norm = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=c.dtype, param_dtype=jnp.float32,
        )
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids, position_ids=None, token_type_ids=None,
                 deterministic=True):
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        from mmf_tpu.modules.transformer import apply_padding_idx

        x = (
            apply_padding_idx(
                self.word_embeddings(input_ids.astype(jnp.int32)),
                input_ids, getattr(self.cfg, "pad_token_id", 0),
            )
            + self.position_embeddings(position_ids.astype(jnp.int32))
            + self.token_type_embeddings(token_type_ids.astype(jnp.int32))
        )
        x = self.layer_norm(x)
        return self.dropout(x, deterministic)


class UNITERModelBase(nn.Module):
    """(reference uniter.py:91-277)"""

    cfg: TransformerConfig
    img_dim: int = 2048

    @nn.compact
    def __call__(self, input_ids, position_ids, img_feat, img_pos_feat,
                 attention_mask, img_masks=None, deterministic=True):
        text_embeddings = UNITERTextEmbeddings(
            self.cfg, name="text_embeddings"
        )
        txt = text_embeddings(
            input_ids, position_ids=position_ids, deterministic=deterministic
        )
        # image type embeddings come from the TEXT token-type table
        # (reference uniter.py:169-177) — tied storage, not a second table
        img_type_ids = jnp.ones(img_feat.shape[:2], jnp.int32)
        type_emb = text_embeddings.token_type_embeddings(img_type_ids)
        img = UNITERImageEmbeddings(
            self.cfg.hidden_size,
            hidden_dropout_prob=self.cfg.hidden_dropout_prob,
            dtype=self.cfg.dtype,
            name="img_embeddings",
        )(img_feat, img_pos_feat, type_emb, img_masks, deterministic)

        x = jnp.concatenate([txt, img], axis=1)
        bias = make_attention_bias(attention_mask, self.cfg.dtype)
        seq = TransformerEncoder(self.cfg, name="encoder")(
            x, bias=bias, deterministic=deterministic
        )
        pooled = Pooler(self.cfg, name="pooler")(seq)
        return seq, pooled


@registry.register_model("uniter")
class UNITER(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/uniter/defaults.yaml"

    def _tcfg(self):
        # the reference nests trunk dims under encoder.params
        # (configs/models/uniter/defaults.yaml:18-26); flat keys override
        enc = dict((self.config.get("encoder", {}) or {}).get("params", {})
                   or {})

        def get(key, default):
            return self.config.get(key, enc.get(key, default))

        return TransformerConfig.from_dict(
            {
                "hidden_size": get("hidden_size", 768),
                "num_hidden_layers": get("num_hidden_layers", 12),
                "num_attention_heads": get("num_attention_heads", 12),
                "intermediate_size": get(
                    "intermediate_size", get("hidden_size", 768) * 4
                ),
                "vocab_size": get("vocab_size", 30522),
                "hidden_dropout_prob": get("hidden_dropout_prob", 0.0),
                "dtype": get("dtype", "float32"),
                "quant": get("quant", "none"),
            }
        )

    def _tasks(self) -> List[str]:
        tasks = self.config.get("tasks", DEFAULT_PRETRAINING_TASKS)
        return tasks.split(",") if isinstance(tasks, str) else list(tasks)

    def get_step_meta(self):
        """Per-step host-side pretraining task choice (reference
        uniter.py samples a task per iteration) — the trainer folds this
        into the batch meta and the jit cache key."""
        if self.config.get("do_pretraining", False):
            return {"task": _random.choice(self._tasks())}
        return {}

    def _pos_feat(self, sample_list, img_feat):
        info = sample_list.get("image_info_0", {}) or {}
        if "img_pos_feat" in sample_list:
            return sample_list["img_pos_feat"]
        if isinstance(info, dict) and "bbox" in info:
            bbox = info["bbox"][:, :, :4]
            w = (bbox[:, :, 2] - bbox[:, :, 0])[..., None]
            h = (bbox[:, :, 3] - bbox[:, :, 1])[..., None]
            return jnp.concatenate([bbox, w, h, w * h], axis=-1)
        B, R = img_feat.shape[:2]
        return jnp.zeros((B, R, 7), jnp.float32)

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        cfg = self._tcfg()
        deterministic = not train
        do_pretraining = self.config.get("do_pretraining", False)

        input_ids = sample_list["input_ids"]
        img_feat = sample_list["image_feature_0"]
        img_pos_feat = self._pos_feat(sample_list, img_feat)
        input_mask = sample_list["input_mask"]
        image_mask = sample_list.get(
            "image_mask", jnp.ones(img_feat.shape[:2], input_mask.dtype)
        )
        attention_mask = jnp.concatenate([input_mask, image_mask], axis=1)
        position_ids = jnp.arange(input_ids.shape[1])[None, :]

        # task selection: classification keys off the dataset; a
        # pretraining task comes from the TRAINER via sample_list["task"]
        # (get_step_meta below — a host-side per-step choice that joins
        # the jit cache key, reference uniter.py random task sampling).
        # With no task given (model.init, or direct apply), ALL tasks run
        # and their losses sum — this also materializes every head's
        # params at init so any later single-task step finds them.
        if do_pretraining:
            task = sample_list.get("task", None)
            tasks_to_run = [task] if task else self._tasks()
        else:
            tasks_to_run = [sample_list.get("dataset_name",
                                            self._tasks()[0])]

        trunk = UNITERModelBase(
            cfg, img_dim=self.config.get("img_dim", 2048), name="uniter"
        )
        heads_cfg = self.config.get("heads", {}) or {}
        T = sample_list["input_ids"].shape[1]

        output: Dict[str, Any] = {}
        merged_losses: Dict[str, Any] = {}
        for task in tasks_to_run:
            task_input_ids = input_ids
            if do_pretraining and task == "mlm" and \
                    "input_ids_masked" in sample_list:
                task_input_ids = sample_list["input_ids_masked"]
            img_masks = None
            if do_pretraining and task in ("mrc", "mrfr") and \
                    "image_labels" in sample_list:
                img_masks = (sample_list["image_labels"] == 1)

            seq, pooled = trunk(
                task_input_ids, position_ids, img_feat, img_pos_feat,
                attention_mask, img_masks, deterministic,
            )

            sl = dict(sample_list)
            if do_pretraining:
                if task == "mlm":
                    labels = sl.get("lm_label_ids",
                                    jnp.full(task_input_ids.shape, -1))
                    pad = jnp.full(
                        (labels.shape[0], img_feat.shape[1]), -1,
                        labels.dtype
                    )
                    sl["mlm_labels"] = {
                        "combined_labels": jnp.concatenate([labels, pad], 1)
                    }
                elif task == "itm":
                    sl.setdefault("is_correct", jnp.ones(
                        task_input_ids.shape[0], jnp.int32))
                elif task == "mrc":
                    info = sl.get("image_info_0", {}) or {}
                    sl["mrc_labels"] = {
                        "targets": info.get(
                            "cls_prob",
                            jnp.zeros(
                                img_feat.shape[:2] + (1601,), jnp.float32
                            ),
                        ),
                        "is_masked": sl.get(
                            "image_labels",
                            jnp.zeros(img_feat.shape[:2], jnp.int32),
                        ) == 1,
                    }
                elif task == "mrfr":
                    sl["mrfr_labels"] = {
                        "targets": img_feat,
                        "is_masked": sl.get(
                            "image_labels",
                            jnp.zeros(img_feat.shape[:2], jnp.int32),
                        ) == 1,
                    }
                elif task == "wra":
                    sl["wra_info"] = {
                        "txt_len": jnp.sum(input_mask, 1),
                        "img_len": jnp.sum(image_mask, 1),
                        "txt_pad": 1 - input_mask,
                        "img_pad": 1 - image_mask,
                        "is_correct": sl.get(
                            "is_correct",
                            jnp.ones(task_input_ids.shape[0], jnp.int32),
                        ),
                    }

            head_config = heads_cfg.get(task, {"type": "mlp",
                                               "num_labels": 2,
                                               "hidden_size":
                                                   cfg.hidden_size})
            head = build_head(dict(head_config), name=f"head_{task}")
            out = head(seq, processed_sample_list=sl,
                       deterministic=deterministic)
            for k, v in dict(out).items():
                if k == "losses":
                    merged_losses.update(v)
                else:
                    output[k] = v
        if merged_losses:
            output["losses"] = merged_losses

        if "losses" in output:
            ds = sample_list.get("dataset_name", "unknown")
            dt = sample_list.get("dataset_type", "train")
            output["losses"] = {
                f"{dt}/{ds}/{k}": v for k, v in output["losses"].items()
            }
        return output
