"""Visual Dialog multi-modal model
(parity with mmf/models/visdial_multi_modal.py:95).

Pythia-style per-turn encoding with a second ("history") text-embedding
stack, a 3-way combine (history rides the combine layer's context arm,
reference forward:86-89), and discriminative option scoring. As in the
reference, candidate answer options are embedded by the SAME embedding
stack as the question (reference _init_decoder:46-52 passes
``text_embeddings[0]`` into the discriminator) — here the sharing is by
flax module-name reuse, so the tables are tied by construction.

The reference class is legacy (never registered, pre-SampleList forward
signature, and its history path feeds a concat the discriminator's dot
product could not consume); this is the working redesign of the same
architecture: dialog dims are flattened batch-side, and options are
scored against the joint embedding at its ACTUAL width.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.pythia import Pythia
from mmf_tpu.modules.decoders import VisDialDiscriminator
from mmf_tpu.modules.embeddings import TextEmbedding
from mmf_tpu.modules.layers import ModalCombineLayer


@registry.register_model("visdial_multi_modal")
class VisDialMultiModalModel(Pythia):
    config: Any = None

    @classmethod
    def config_path(cls):
        return None

    @nn.compact
    def __call__(self, sample_list: Dict[str, Any], train: bool = False):
        deterministic = not train

        def flat_turns(x):
            # [B, D, ...] dialog layout -> [B*D, ...] (reference
            # forward:63-75 view(-1, ...) on texts/histories/features)
            return x.reshape(-1, *x.shape[2:])

        # shared modules, instantiated ONCE and applied to question,
        # history and answer options (flax shares params per instance)
        embed_tbl = nn.Embed(
            self._vocab_size(), 300, name="word_embedding"
        )
        te_mods = [
            TextEmbedding(
                te_cfg["type"], te_cfg.get("params", {}),
                name=f"text_embeddings_{i}",
            )
            for i, te_cfg in enumerate(self.config["text_embeddings"])
        ]

        def embed_text(tok):
            emb = embed_tbl(tok.astype(jnp.int32))
            return jnp.concatenate(
                [m(emb, deterministic=deterministic) for m in te_mods],
                axis=1,
            )

        texts = sample_list["text"]
        if texts.ndim == 3:
            texts = flat_turns(texts)
        text_total = embed_text(texts)

        hist_total = None
        if "history" in sample_list:
            hist = sample_list["history"]
            if hist.ndim == 3:
                hist = flat_turns(hist)
            hist_emb = embed_tbl(hist.astype(jnp.int32))  # shared table
            h_cfgs = self.config.get(
                "history_embeddings", self.config["text_embeddings"]
            )
            embeds = [
                TextEmbedding(
                    te_cfg["type"], te_cfg.get("params", {}),
                    name=f"history_embeddings_{i}",
                )(hist_emb, deterministic=deterministic)
                for i, te_cfg in enumerate(h_cfgs)
            ]
            hist_total = jnp.concatenate(embeds, axis=1)

        sl = dict(sample_list)
        i = 0
        while f"image_feature_{i}" in sl:
            f = sl[f"image_feature_{i}"]
            if f.ndim == 4:
                sl[f"image_feature_{i}"] = flat_turns(f)
            info = sl.get(f"image_info_{i}", None)
            if info and getattr(
                info.get("max_features", None), "ndim", 1
            ) == 2:
                info = dict(info)
                info["max_features"] = info["max_features"].reshape(-1)
                sl[f"image_info_{i}"] = info
            i += 1
        image_total, _ = self._feature_embedding_total(
            "image", sl, text_total, deterministic
        )

        cc = self.config["image_text_modal_combine"]
        joint = ModalCombineLayer(
            cc["type"], 0, 0, cc.get("params", {}),
            name="multi_modal_combine_layer",
        )(image_total, text_total, hist_total, deterministic=deterministic)

        # candidate options through the SHARED question-embedding stack
        opts = sample_list["answer_options"]
        nb, nd, no, sq = opts.shape
        opt_emb = embed_text(opts.reshape(-1, sq))
        opt_emb = opt_emb.reshape(nb * nd, no, -1)

        scores = VisDialDiscriminator(
            joint.shape[-1], name="decoder"
        )(joint, opt_emb)
        return {"scores": scores}
