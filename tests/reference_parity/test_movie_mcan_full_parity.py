"""Full-model MoVie+MCAN golden parity vs the torch reference
(mmf/models/movie_mcan.py:257-275 forward): word embedding -> SAEmbedding
(LSTM + self-attn + 2-vector attention pool) -> TwoBranchEmbedding over
the grid features conditioned on pooled vector 0 -> BranchCombineLayer
with pooled vector 1 -> TripleLinear classifier, with converted weights.
Pins the vec[:,0]/vec[:,1] routing and the text.eq(0) padding mask."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import (
    convert_torch_lstm_weights,
    convert_torch_state_dict,
)
from mmf_tpu.utils.env import setup_imports

from tests.reference_parity.test_mcan_parity import TB_KEY_MAP

setup_imports()

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 3e-5

# the reference CBN branch hardcodes its 1024-dim output
# (embeddings.py:552 ``self.out_dim = 1024``), and BranchCombineLayer
# requires img_dim == that — so hidden must be 1024; keep layer counts
# minimal instead
VOCAB, EMB, HID, COND = 40, 300, 1024, 1024
ATT, L, CBN_L, NF = 8, 1, 1, 2
NUM_ANS = 7
B, T, GH, GW, C_IMG = 2, 4, 2, 2, 16


@pytest.fixture(scope="module")
def ref_mods():
    from tests.reference_parity import shims

    shims.install()
    import mmf.modules.embeddings as ref_emb
    import mmf.modules.layers as ref_layers

    yield {"emb": ref_emb, "layers": ref_layers}
    shims.uninstall()


def test_movie_mcan_full_forward_parity(ref_mods):
    import jax
    import torch

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega

    torch.manual_seed(21)
    emb = torch.nn.Embedding(VOCAB, EMB)
    text_emb = ref_mods["emb"].SAEmbedding(
        HID, EMB, num_attn=ATT, num_layers=L, dropout=0.0,
        num_attn_pool=1, num_feat=NF,
    )
    img_emb = ref_mods["emb"].TwoBranchEmbedding(
        C_IMG, hidden_dim=HID, num_attn=ATT, num_layers=L, dropout=0.0,
        cond_dim=COND, cbn_num_layers=CBN_L,
    )
    combine = ref_mods["layers"].BranchCombineLayer(HID, HID)
    classifier = ref_mods["layers"].TripleLinear(HID * 2, NUM_ANS)
    mods = (emb, text_emb, img_emb, combine, classifier)
    for m in mods:
        m.eval()
    with torch.no_grad():
        for name, buf in img_emb.named_buffers():
            if "running_mean" in name:
                buf.normal_(0, 0.2)
            if "running_var" in name:
                buf.uniform_(0.5, 1.5)

    rng = np.random.RandomState(21)
    text = rng.randint(1, VOCAB, (B, T))
    text[1, -2:] = 0  # padding -> text.eq(0) mask
    feats = rng.randn(B, C_IMG, GH, GW).astype(np.float32)

    # the reference forward (movie_mcan.py:257-275), composed explicitly
    with torch.no_grad():
        t_text = torch.from_numpy(text)
        t_mask = t_text.eq(0)
        t_emb = emb(t_text)
        total, vec = text_emb(t_emb, t_mask)
        sga, cbn = img_emb(
            torch.from_numpy(feats), total, vec[:, 0], None, t_mask
        )
        joint = combine(sga, cbn, vec[:, 1])
        t_scores = classifier(joint).numpy()

    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    registry.register("vqa2_num_final_outputs", NUM_ANS)
    mc = omega.create({
        "text_vocab_size": VOCAB,
        "text_embeddings": {"params": {
            "hidden_dim": HID, "embedding_dim": EMB, "num_attn": ATT,
            "num_layers": L, "dropout": 0.0, "num_attn_pool": 1,
            "num_feat": NF,
        }},
        "image_feature_embeddings": {"params": {
            "hidden_dim": HID, "cond_dim": COND, "num_attn": ATT,
            "num_layers": L, "dropout": 0.0, "cbn_num_layers": CBN_L,
        }},
        "classifier": {"type": "triple_linear", "params": {}},
    })
    jmodel = registry.get_model_class("movie_mcan")(config=mc)
    batch = {"text": text, "image_feature_0": feats,
             "dataset_name": "vqa2", "dataset_type": "val"}
    variables = jmodel.init(jax.random.PRNGKey(0), batch, False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    # assemble a prefixed torch state dict matching our param tree
    sd = {}
    for prefix, mod in (
        ("word_embedding", emb), ("text_embeddings", text_emb),
        ("image_feature_embeddings_list", img_emb),
        ("combine_layer", combine), ("classifier", classifier),
    ):
        for k, v in mod.state_dict().items():
            if k.endswith("num_batches_tracked") or ".ln_mha.2" in k:
                continue
            sd[f"{prefix}.{k}"] = v.detach().numpy()

    params["word_embedding"]["embedding"] = sd.pop("word_embedding.weight")
    # SAEmbedding's LSTM cell converts separately
    cell_key = next(k for k, v in params["text_embeddings"].items()
                    if isinstance(v, dict) and "hf" in v)
    params["text_embeddings"][cell_key] = convert_torch_lstm_weights(
        sd.pop("text_embeddings.lstm.weight_ih_l0"),
        sd.pop("text_embeddings.lstm.weight_hh_l0"),
        sd.pop("text_embeddings.lstm.bias_ih_l0"),
        sd.pop("text_embeddings.lstm.bias_hh_l0"),
    )

    key_map = {
        # SAEmbedding internals
        r"text_embeddings\.self_attns\.(\d+)\.multi_head_attn\.linears\.0":
            r"text_embeddings.self_attn_\1.mhatt.q_lin",
        r"text_embeddings\.self_attns\.(\d+)\.multi_head_attn\.linears\.1":
            r"text_embeddings.self_attn_\1.mhatt.k_lin",
        r"text_embeddings\.self_attns\.(\d+)\.multi_head_attn\.linears\.2":
            r"text_embeddings.self_attn_\1.mhatt.v_lin",
        r"text_embeddings\.self_attns\.(\d+)\.multi_head_attn\.linears\.3":
            r"text_embeddings.self_attn_\1.mhatt.out_lin",
        r"text_embeddings\.self_attns\.(\d+)\.fcn\.0":
            r"text_embeddings.self_attn_\1.ffn.fc",
        r"text_embeddings\.self_attns\.(\d+)\.fcn\.3":
            r"text_embeddings.self_attn_\1.ffn.out",
        r"text_embeddings\.self_attns\.(\d+)\.ln_mha":
            r"text_embeddings.self_attn_\1.ln1",
        r"text_embeddings\.self_attns\.(\d+)\.ln_fcn":
            r"text_embeddings.self_attn_\1.ln2",
        r"text_embeddings\.attn_pool\.linear\.0": "text_embeddings.attn_pool.lin1",
        r"text_embeddings\.attn_pool\.linear\.3": "text_embeddings.attn_pool.lin2",
        # TwoBranchEmbedding internals (same shapes as the module test,
        # under the full-model prefix — TB_KEY_MAP anchors stripped)
        **{pat.lstrip("^").replace("^", ""): repl
           for pat, repl in TB_KEY_MAP.items()},
        # BranchCombineLayer / TripleLinear
        r"combine_layer\.linear_cga\.(\d)": r"combine_layer.linear_cga\1",
        r"combine_layer\.linear_cbn\.(\d)": r"combine_layer.linear_cbn\1",
        r"combine_layer\.linear_ques\.(\d)": r"combine_layer.linear_ques\1",
        r"combine_layer\.layer_norm\.0\.": "combine_layer.ln0.",
        r"combine_layer\.layer_norm\.1\.": "combine_layer.ln1.",
        r"combine_layer\.layer_norm\.2\.": "combine_layer.ln2.",
        r"classifier\.linears\.(\d)": r"classifier.linear_\1",
    }
    converted, stats = convert_torch_state_dict(sd, params, key_map=key_map)
    assert stats["shape_mismatch"] == 0, stats
    assert stats["missed"] == 0, stats

    out = jmodel.apply({"params": converted}, batch, False)
    j_scores = np.asarray(out["scores"])
    assert j_scores.shape == t_scores.shape
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)
