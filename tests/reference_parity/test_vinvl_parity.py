"""VinVL (Oscar+) trunk golden parity vs the PyTorch reference
(mmf/models/vinvl.py:43-123): tag-augmented text + projected image
features (with the default image LayerNorm) through one BERT encoder,
with converted weights on identical inputs including padding."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import convert_torch_state_dict

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5

VINVL_KEY_MAP = {
    r"^bert\.embeddings\.LayerNorm": "embeddings.layer_norm",
    r"^bert\.embeddings\.": "embeddings.",
    r"^bert\.img_embedding\.0\.": "img_projection.",
    r"^bert\.img_embedding\.1\.": "img_layer_norm.",
    r"^bert\.encoder\.layer\.(\d+)\.": r"encoder.layer_\1.",
    r"attention\.self\.(query|key|value)": r"attention.\1",
    r"attention\.output\.dense": "attention.output_dense",
    r"attention\.output\.LayerNorm": "attention.output_layer_norm",
    r"intermediate\.dense": "ffn.intermediate_dense",
    r"(layer_\d+)\.output\.dense": r"\1.ffn.output_dense",
    r"(layer_\d+)\.output\.LayerNorm": r"\1.ffn.output_layer_norm",
    r"^bert\.pooler\.": "pooler.",
}


@pytest.fixture(scope="module")
def ref_vinvl():
    from tests.reference_parity import shims

    shims.install()
    import mmf.models.vinvl as ref_vinvl_mod

    yield ref_vinvl_mod
    shims.uninstall()


def test_vinvl_trunk_parity(ref_vinvl):
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.common.registry import registry
    from mmf_tpu.utils.env import setup_imports

    setup_imports()

    torch.manual_seed(13)
    H, IMG_DIM = 24, 30
    bert_config = BertConfig(
        vocab_size=80, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bert_config.img_feature_dim = IMG_DIM
    bert_config.use_img_layernorm = True
    bert_config.img_layer_norm_eps = 1e-12
    bert_config._attn_implementation = "eager"
    tmodel = ref_vinvl.VinVLBase(bert_config).eval()

    B, S, R = 2, 6, 4
    rng = np.random.RandomState(13)
    input_ids = rng.randint(0, 80, (B, S))
    segment_ids = np.zeros((B, S), np.int64)
    img_feats = rng.randn(B, R, IMG_DIM).astype(np.float32)
    attention_mask = np.ones((B, S + R), np.float32)
    attention_mask[0, -1] = 0  # padded region
    attention_mask[1, S - 1] = 0  # padded text token

    with torch.no_grad():
        t_seq = tmodel(
            torch.from_numpy(input_ids),
            torch.from_numpy(img_feats),
            token_type_ids=torch.from_numpy(segment_ids),
            attention_mask=torch.from_numpy(attention_mask),
        ).last_hidden_state

    jcls = registry.get_model_class("vinvl")
    jmodel = jcls(config={
        "training_head_type": "classification",
        "hidden_size": H, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 48,
        "vocab_size": 80, "num_labels": 3,
        "max_position_embeddings": 32, "type_vocab_size": 2,
        "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
        "use_img_layernorm": True, "img_layer_norm_eps": 1e-12,
        "losses": [],
    })
    batch = {
        "input_ids": input_ids,
        "input_mask": attention_mask[:, :S].astype(np.int64),
        "segment_ids": segment_ids,
        "image_feature_0": img_feats,
        "image_mask": attention_mask[:, S:].astype(np.int64),
        "dataset_name": "vqa2", "dataset_type": "val",
    }
    params = jmodel.init(jax.random.PRNGKey(0), batch, False)

    sd = {f"bert.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=VINVL_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats

    # VinVLBase has no pooler/classifier, so compare the encoder's full
    # sequence output via flax intermediate capture
    _, state = jmodel.apply(
        {"params": converted}, batch, False,
        capture_intermediates=lambda mdl, name: mdl.name == "encoder",
        mutable=["intermediates"],
    )
    j_seq = state["intermediates"]["encoder"]["__call__"][0]
    np.testing.assert_allclose(np.asarray(j_seq), t_seq.numpy(), atol=ATOL)
