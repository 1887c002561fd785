"""CNNLSTM: the simple CLEVR baseline (parity with mmf/models/cnn_lstm.py).
Used heavily by the reference test-suite as the minimal real model."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mmf_tpu.common.registry import registry
from mmf_tpu.models.base_model import BaseModel
from mmf_tpu.modules.layers import ClassifierLayer, ConvNet

_TEMPLATES = {
    "question_vocab_size": "{}_text_vocab_size",
    "number_of_answers": "{}_num_final_outputs",
}


@registry.register_model("cnn_lstm")
class CNNLSTM(BaseModel):
    config: Any = None

    @classmethod
    def config_path(cls):
        return "configs/models/cnn_lstm/defaults.yaml"

    def _dataset(self):
        cfg = registry.get("config", no_warning=True)
        if cfg is not None and cfg.get("datasets", None):
            d = cfg["datasets"]
            return (d.split(",") if isinstance(d, str) else list(d))[0]
        return "clevr"

    @nn.compact
    def __call__(self, sample_list, train: bool = False):
        deterministic = not train
        dataset = self._dataset()
        num_question_choices = registry.get(
            _TEMPLATES["question_vocab_size"].format(dataset),
            no_warning=True,
        ) or self.config.get("text_vocab_size", 100)
        num_answer_choices = registry.get(
            _TEMPLATES["number_of_answers"].format(dataset), no_warning=True
        ) or self.config.get("num_labels", 32)

        question = sample_list["text"]
        image = sample_list["image"]

        emb = nn.Embed(
            num_question_choices,
            self.config["text_embedding"]["embedding_dim"],
            name="text_embedding",
        )(question.astype(jnp.int32))

        lstm_cfg = self.config["lstm"]
        hidden_size = lstm_cfg["hidden_size"]
        fwd = nn.RNN(
            nn.OptimizedLSTMCell(hidden_size, name="lstm_fwd")
        )
        out_f = fwd(emb)
        if lstm_cfg.get("bidirectional", False):
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(hidden_size, name="lstm_bwd"),
                reverse=True, keep_order=True,
            )
            out_b = bwd(emb)
            hidden = jnp.concatenate([out_f[:, -1], out_b[:, 0]], axis=-1)
        else:
            hidden = out_f[:, -1]

        layers_config = self.config["cnn"]["layers"]
        x = image
        for i in range(len(layers_config["input_dims"])):
            x = ConvNet(
                layers_config["output_dims"][i],
                layers_config["kernel_sizes"][i],
                name=f"cnn_{i}",
            )(x, deterministic)
        x = x.reshape(x.shape[0], -1)

        fused = jnp.concatenate([hidden, x], axis=-1)
        cc = self.config["classifier"]
        params = dict(cc.get("params", {}))
        params.pop("out_dim", None)
        scores = ClassifierLayer(
            cc["type"], 0, num_answer_choices, params=params,
            name="classifier",
        )(fused, deterministic)
        return {"scores": scores}
