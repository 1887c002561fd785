"""UNITER trunk golden parity vs the PyTorch reference
(mmf/models/uniter.py:45-246): the reference's UNITERImageEmbeddings
verbatim + BertEmbeddings text side + HF Bert encoder/pooler, assembled
the way UNITERModelBase.forward does (its __init__ needs hub access which
this image lacks) — including the detail that image type embeddings are
gathered from the TEXT token-type table (uniter.py:169-177)."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import convert_torch_state_dict

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5

UNITER_KEY_MAP = {
    # HF BertEmbeddings uses LayerNorm; ours layer_norm
    r"^text_embeddings\.LayerNorm": "text_embeddings.layer_norm",
    # HF encoder layer internals onto our TransformerEncoder naming
    r"^encoder\.layer\.(\d+)\.": r"encoder.layer_\1.",
    r"attention\.self\.(query|key|value)": r"attention.\1",
    r"attention\.output\.dense": "attention.output_dense",
    r"attention\.output\.LayerNorm": "attention.output_layer_norm",
    r"intermediate\.dense": "ffn.intermediate_dense",
    r"(layer_\d+)\.output\.dense": r"\1.ffn.output_dense",
    r"(layer_\d+)\.output\.LayerNorm": r"\1.ffn.output_layer_norm",
}


@pytest.fixture(scope="module")
def ref_uniter():
    from tests.reference_parity import shims

    shims.install()
    import mmf.models.uniter as ref_uniter_mod

    yield ref_uniter_mod
    shims.uninstall()


def test_uniter_trunk_parity(ref_uniter):
    import jax
    import torch
    from transformers import BertConfig, BertModel
    from transformers.models.bert.modeling_bert import BertEmbeddings

    from mmf_tpu.models.uniter import UNITERModelBase
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(11)
    H, IMG_DIM, POS_DIM = 24, 16, 7
    bert_config = BertConfig(
        vocab_size=80, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    text_embeddings = BertEmbeddings(bert_config).eval()
    img_embeddings = ref_uniter.UNITERImageEmbeddings(
        img_dim=IMG_DIM, hidden_size=H, hidden_dropout_prob=0.0,
        pos_dim=POS_DIM,
    ).eval()
    bert = BertModel(bert_config).eval()

    B, S, R = 2, 6, 4
    rng = np.random.RandomState(11)
    input_ids = rng.randint(0, 80, (B, S))
    position_ids = np.tile(np.arange(S), (B, 1))
    img_feat = rng.randn(B, R, IMG_DIM).astype(np.float32)
    img_pos_feat = rng.rand(B, R, POS_DIM).astype(np.float32)
    attention_mask = np.ones((B, S + R), np.float32)
    attention_mask[1, -1] = 0  # padded region
    img_masks = np.zeros((B, R), np.int64)
    img_masks[0, 1] = 1  # one masked region exercises mask_embedding

    with torch.no_grad():
        # UNITERModelBase.forward semantics (uniter.py:197-246)
        txt_emb = text_embeddings(
            input_ids=torch.from_numpy(input_ids),
            position_ids=torch.from_numpy(position_ids),
        )
        img_type_ids = torch.ones(B, R, dtype=torch.long)
        img_type_emb = text_embeddings.token_type_embeddings(img_type_ids)
        img_emb = img_embeddings(
            torch.from_numpy(img_feat), torch.from_numpy(img_pos_feat),
            img_type_emb, torch.from_numpy(img_masks),
        )
        embedding_output = torch.cat([txt_emb, img_emb], dim=1)
        ext = (1.0 - torch.from_numpy(attention_mask)) * -10000.0
        ext = ext[:, None, None, :]
        t_seq = bert.encoder(embedding_output, attention_mask=ext)[0]
        t_pooled = bert.pooler(t_seq)

    cfg = TransformerConfig(
        vocab_size=80, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = UNITERModelBase(cfg, img_dim=IMG_DIM)
    params = jmodel.init(
        jax.random.PRNGKey(0), input_ids, position_ids, img_feat,
        img_pos_feat, attention_mask, img_masks,
    )

    sd = {}
    for k, v in text_embeddings.state_dict().items():
        sd[f"text_embeddings.{k}"] = v.detach().numpy()
    for k, v in img_embeddings.state_dict().items():
        sd[f"img_embeddings.{k}"] = v.detach().numpy()
    for k, v in bert.encoder.state_dict().items():
        sd[f"encoder.{k}"] = v.detach().numpy()
    for k, v in bert.pooler.state_dict().items():
        sd[f"pooler.{k}"] = v.detach().numpy()

    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=UNITER_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats

    j_seq, j_pooled = jmodel.apply(
        {"params": converted}, input_ids, position_ids, img_feat,
        img_pos_feat, attention_mask, img_masks,
    )
    np.testing.assert_allclose(np.asarray(j_seq), t_seq.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_pooled), t_pooled.numpy(),
                               atol=ATOL)
