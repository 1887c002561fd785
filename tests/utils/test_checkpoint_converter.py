"""torch->flax conversion parity: build a tiny torch BERT with HF naming,
convert its weights onto our trunk, and require logit agreement <1e-4
(the north-star parity mechanism, scaled down)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from mmf_tpu.modules.transformer import TransformerConfig, TransformerModel
from mmf_tpu.utils.checkpoint_updater import (
    HF_BERT_KEY_MAP,
    convert_torch_state_dict,
)

H, HEADS, INTER, VOCAB, MAXPOS, TYPES = 16, 2, 32, 50, 32, 2


class TorchMiniBert(tnn.Module):
    """HF-naming-compatible miniature BERT (own implementation)."""

    def __init__(self, layers=2):
        super().__init__()
        self.embeddings = tnn.Module()
        self.embeddings.word_embeddings = tnn.Embedding(VOCAB, H)
        self.embeddings.position_embeddings = tnn.Embedding(MAXPOS, H)
        self.embeddings.token_type_embeddings = tnn.Embedding(TYPES, H)
        self.embeddings.LayerNorm = tnn.LayerNorm(H, eps=1e-12)
        self.encoder = tnn.Module()
        self.encoder.layer = tnn.ModuleList()
        for _ in range(layers):
            layer = tnn.Module()
            layer.attention = tnn.Module()
            layer.attention.self = tnn.Module()
            layer.attention.self.query = tnn.Linear(H, H)
            layer.attention.self.key = tnn.Linear(H, H)
            layer.attention.self.value = tnn.Linear(H, H)
            layer.attention.output = tnn.Module()
            layer.attention.output.dense = tnn.Linear(H, H)
            layer.attention.output.LayerNorm = tnn.LayerNorm(H, eps=1e-12)
            layer.intermediate = tnn.Module()
            layer.intermediate.dense = tnn.Linear(H, INTER)
            layer.output = tnn.Module()
            layer.output.dense = tnn.Linear(INTER, H)
            layer.output.LayerNorm = tnn.LayerNorm(H, eps=1e-12)
            self.encoder.layer.append(layer)
        self.pooler = tnn.Module()
        self.pooler.dense = tnn.Linear(H, H)

    def forward(self, input_ids, token_type_ids):
        pos = torch.arange(input_ids.shape[1])[None]
        x = (
            self.embeddings.word_embeddings(input_ids)
            + self.embeddings.position_embeddings(pos)
            + self.embeddings.token_type_embeddings(token_type_ids)
        )
        x = self.embeddings.LayerNorm(x)
        for layer in self.encoder.layer:
            q = layer.attention.self.query(x)
            k = layer.attention.self.key(x)
            v = layer.attention.self.value(x)
            B, S, _ = q.shape
            d = H // HEADS

            def split(t):
                return t.view(B, S, HEADS, d).transpose(1, 2)

            att = torch.softmax(
                split(q) @ split(k).transpose(-1, -2) / math.sqrt(d), dim=-1
            )
            ctx = (att @ split(v)).transpose(1, 2).reshape(B, S, H)
            x = layer.attention.output.LayerNorm(
                layer.attention.output.dense(ctx) + x
            )
            inter = torch.nn.functional.gelu(layer.intermediate.dense(x))
            x = layer.output.LayerNorm(layer.output.dense(inter) + x)
        pooled = torch.tanh(self.pooler.dense(x[:, 0]))
        return x, pooled


def test_torch_to_flax_bert_parity():
    torch.manual_seed(0)
    tmodel = TorchMiniBert(layers=2).eval()

    cfg = TransformerConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=MAXPOS, type_vocab_size=TYPES,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    fmodel = TransformerModel(cfg)
    rng = np.random.RandomState(0)
    input_ids = rng.randint(0, VOCAB, (2, 8))
    token_type_ids = np.zeros((2, 8), np.int64)

    variables = fmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(input_ids), None,
        jnp.asarray(token_type_ids),
    )

    state_dict = {
        k: v.detach().numpy() for k, v in tmodel.state_dict().items()
    }
    new_params, stats = convert_torch_state_dict(
        state_dict, variables["params"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["missed"] == 0, stats
    assert stats["shape_mismatch"] == 0, stats

    with torch.no_grad():
        t_seq, t_pooled = tmodel(
            torch.from_numpy(input_ids), torch.from_numpy(token_type_ids)
        )
    f_seq, f_pooled = fmodel.apply(
        {"params": new_params}, jnp.asarray(input_ids), None,
        jnp.asarray(token_type_ids),
    )
    np.testing.assert_allclose(
        np.asarray(f_seq), t_seq.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(f_pooled), t_pooled.numpy(), atol=1e-4
    )


def test_pretrained_mapping_segment_boundary():
    """pretrained_state_mapping must match path segments, not substrings:
    mapping 'pooler' -> 'bert.pooler' must NOT rewrite 't_pooler'."""
    import numpy as np

    from mmf_tpu.utils.checkpoint import _flatten, _unflatten

    class _FakeTrainer:
        def __init__(self):
            self._vars = {
                "params": {
                    "pooler": {"kernel": np.zeros((2, 2), np.float32)},
                    "t_pooler": {"kernel": np.zeros((2, 2), np.float32)},
                }
            }

        def get_variables(self):
            return self._vars

        def set_variables(self, v):
            self._vars = v

        model = type("M", (), {})()

    from mmf_tpu.utils.checkpoint import Checkpoint

    ckpt = Checkpoint.__new__(Checkpoint)
    ckpt.trainer = _FakeTrainer()
    incoming = {
        "variables": {
            "params": {
                "bert": {"pooler": {"kernel": np.ones((2, 2), np.float32)}}
            }
        }
    }
    ckpt._load_pretrained_mapped(
        incoming, {"params.pooler": "params.bert.pooler"}
    )
    v = ckpt.trainer.get_variables()["params"]
    np.testing.assert_array_equal(v["pooler"]["kernel"], np.ones((2, 2)))
    np.testing.assert_array_equal(v["t_pooler"]["kernel"], np.zeros((2, 2)))
