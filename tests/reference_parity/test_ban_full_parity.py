"""Full-model BAN golden parity vs the torch reference
(mmf/models/ban.py:80-96 forward): word embedding -> GRU forward_all ->
BiAttention.forward_all -> per-glimpse BCNet.forward_with_weights +
weight-normed q_prj residual -> WeightNormClassifier, with converted
weights (incl. torch GRU -> flax GRUCell)."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.env import setup_imports

setup_imports()

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.models.ban as ref_ban
    import mmf.modules.embeddings as ref_emb
    import mmf.modules.layers as ref_layers

    yield {"ban": ref_ban, "emb": ref_emb, "layers": ref_layers}
    shims.uninstall()


def _wn(sd, prefix):
    """torch weight_norm(dim=None) Linear -> (g, v, bias). flax WeightNorm
    stores kernel=v + a scalar scale=g so that w = g * v/||v||."""
    for g_key, v_key in (
        (f"{prefix}.parametrizations.weight.original0",
         f"{prefix}.parametrizations.weight.original1"),
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
    ):
        if g_key in sd:
            return sd[g_key], sd[v_key], sd.get(f"{prefix}.bias")
    raise KeyError(prefix)


def _fcnet_params(sd, prefix):
    # torch FCNet puts Dropout before the Linear when dropout > 0, so the
    # weight-normed Linear may sit at main.0 or main.1
    g = v = bias = None
    for i in (0, 1):
        for g_key, v_key in (
            (f"{prefix}.main.{i}.parametrizations.weight.original0",
             f"{prefix}.main.{i}.parametrizations.weight.original1"),
            (f"{prefix}.main.{i}.weight_g", f"{prefix}.main.{i}.weight_v"),
        ):
            if g_key in sd:
                g, v, bias = sd[g_key], sd[v_key], sd[f"{prefix}.main.{i}.bias"]
                break
        if g is not None:
            break
    assert g is not None, prefix
    return {
        "Dense_0": {"kernel": np.ascontiguousarray(v.T), "bias": bias},
        "fc_0": {"Dense_0/kernel/scale": np.float32(np.reshape(g, ()))},
    }


def test_ban_full_forward_parity(ref):
    import jax
    import torch

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega
    from mmf_tpu.utils.checkpoint_updater import convert_torch_gru_weights

    torch.manual_seed(3)
    VOCAB, EMB, H, VD, G, K = 30, 300, 8, 6, 2, 1
    NUM_ANS = 7

    emb = torch.nn.Embedding(VOCAB, EMB)
    q_emb = ref["emb"].BiLSTMTextEmbedding(H, EMB, 1, 0.0, False, "GRU")
    v_att = ref["layers"].BiAttention(VD, H, H, G)
    b_net = [ref["layers"].BCNet(VD, H, H, None, k=K) for _ in range(G)]
    q_prj = [ref["layers"].FCNet(dims=[H, H], act=None, dropout=0.0)
             for _ in range(G)]
    classifier = ref["layers"].WeightNormClassifier(H, NUM_ANS, H * 2, 0.0)
    for m in (emb, q_emb, v_att, *b_net, *q_prj, classifier):
        m.eval()

    B, NV, NQ = 2, 5, 4
    rng = np.random.RandomState(3)
    text = rng.randint(0, VOCAB, (B, NQ))
    v = rng.randn(B, NV, VD).astype(np.float32)
    v[1, -1] = 0  # a zeroed region exercises the v_mask path

    # the reference BAN.forward (ban.py:80-96), composed explicitly
    with torch.no_grad():
        tq = q_emb.forward_all(emb(torch.from_numpy(text)))
        att, _ = v_att.forward_all(torch.from_numpy(v), tq)
        for g in range(G):
            g_att = att[:, g, :, :]
            bg = b_net[g].forward_with_weights(
                torch.from_numpy(v), tq, g_att
            )
            tq = q_prj[g](bg.unsqueeze(1)) + tq
        t_logits = classifier(tq.sum(1)).numpy()

    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    mc = omega.create({
        "text_vocab_size": VOCAB,
        "num_labels": NUM_ANS,
        "text_embedding": {
            "num_hidden": H, "emb_size": EMB, "num_layers": 1,
            "dropout": 0.0, "bidirectional": False, "rnn_type": "GRU",
        },
        "bilinear_attention": {
            "gamma": G, "visual_feat_dim": VD,
            "bc_net": {"k": K, "dropout": [0.0, 0.0]},
            "fc_net": {"activation": None, "dropout": 0.0},
        },
        "classifier": {"dropout": 0.0},
    })
    model = registry.get_model_class("ban")(config=mc)
    batch = {"text": text, "image_feature_0": v,
             "dataset_name": "vqa2", "dataset_type": "val"}
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = {k: t.detach().numpy() for k, t in {
        **{f"emb.{k}": v_ for k, v_ in emb.state_dict().items()},
        **{f"q_emb.{k}": v_ for k, v_ in q_emb.state_dict().items()},
        **{f"v_att.{k}": v_ for k, v_ in v_att.state_dict().items()},
        **{f"b_net.{g}.{k}": v_ for g in range(G)
           for k, v_ in b_net[g].state_dict().items()},
        **{f"q_prj.{g}.{k}": v_ for g in range(G)
           for k, v_ in q_prj[g].state_dict().items()},
        **{f"classifier.{k}": v_
           for k, v_ in classifier.state_dict().items()},
    }.items()}

    params["word_embedding"]["embedding"] = sd["emb.weight"]
    params["q_emb"]["rnn_0_fwd"] = convert_torch_gru_weights(
        sd["q_emb.recurrent_encoder.weight_ih_l0"],
        sd["q_emb.recurrent_encoder.weight_hh_l0"],
        sd["q_emb.recurrent_encoder.bias_ih_l0"],
        sd["q_emb.recurrent_encoder.bias_hh_l0"],
    )
    params["v_att"]["logits"]["v_net"] = _fcnet_params(sd, "v_att.logits.v_net")
    params["v_att"]["logits"]["q_net"] = _fcnet_params(sd, "v_att.logits.q_net")
    h_g, h_v = sd["v_att.logits.h_mat_g"], sd["v_att.logits.h_mat_v"]
    params["v_att"]["logits"]["h_mat"] = h_g * h_v / np.linalg.norm(h_v)
    params["v_att"]["logits"]["h_bias"] = sd["v_att.logits.h_bias"]
    for g in range(G):
        params[f"b_net_{g}"]["v_net"] = _fcnet_params(sd, f"b_net.{g}.v_net")
        params[f"b_net_{g}"]["q_net"] = _fcnet_params(sd, f"b_net.{g}.q_net")
        params[f"q_prj_{g}"] = _fcnet_params(sd, f"q_prj.{g}")
    for wn_name, dense, theirs in (
        ("fc1", "Dense_0", "classifier.main.0"),
        ("fc2", "Dense_1", "classifier.main.3"),
    ):
        g, v_raw, b = _wn(sd, theirs)
        params["classifier"][dense] = {
            "kernel": np.ascontiguousarray(v_raw.T), "bias": b,
        }
        params["classifier"][wn_name] = {
            f"{dense}/kernel/scale": np.float32(np.reshape(g, ())),
        }

    out = model.apply({"params": params}, batch, False)
    np.testing.assert_allclose(np.asarray(out["scores"]), t_logits,
                               atol=ATOL)
