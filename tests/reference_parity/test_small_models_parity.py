"""Full-model golden parity for the small baseline models that previously
had construct+forward coverage only: cnn_lstm (reference
mmf/models/cnn_lstm.py:21-103), concat_bert and late_fusion (reference
mmf/models/fusions.py:57-194). Weights are converted torch -> flax and
eval logits compared at f32.

krisp is excluded: its reference graph module imports torch_geometric
(projects/krisp/graphnetwork_module.py:21), which is not installed in
this image, so the reference side cannot run.
"""

import os
from types import SimpleNamespace

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
    import mmf.models.cnn_lstm as ref_cnn_lstm
    import mmf.modules.layers as ref_layers

    yield {"cnn_lstm": ref_cnn_lstm, "layers": ref_layers}
    shims.uninstall()


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _find_lstm_cell(tree):
    """Locate the LSTMCell param subtree ('ii' gate present), whether the
    RNN wrapper nests it under 'cell' or not."""
    if "ii" in tree:
        return tree
    if "cell" in tree:
        return _find_lstm_cell(tree["cell"])
    raise KeyError(f"no LSTM cell subtree in {list(tree)}")


def test_cnn_lstm_full_parity(ref):
    import jax
    import torch
    from omegaconf import OmegaConf

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega
    from mmf_tpu.utils.checkpoint_updater import convert_torch_lstm_weights

    VOCAB, NUM_ANS = 40, 7
    B, NQ, IMG = 2, 5, 64  # 64px -> six stride-2 pools -> 1x1

    model_cfg = {
        "losses": [{"type": "logit_bce"}],
        "text_embedding": {"embedding_dim": 20},
        "lstm": {"input_size": 20, "hidden_size": 50,
                 "bidirectional": True, "batch_first": True},
        "cnn": {"layers": {
            "input_dims": [3, 64, 128, 128, 64, 64],
            "output_dims": [64, 128, 128, 64, 64, 10],
            "kernel_sizes": [7, 5, 5, 5, 5, 1],
        }},
        "classifier": {"type": "mlp", "params": {"in_dim": 110,
                                                 "out_dim": 2}},
    }

    # ---- reference model, registry-driven exactly like mmf_run ----
    from mmf.common.registry import registry as ref_registry

    ref_registry.register("config", OmegaConf.create({"datasets": "clevr"}))
    ref_registry.register("clevr_text_vocab_size", VOCAB)
    ref_registry.register("clevr_num_final_outputs", NUM_ANS)
    torch.manual_seed(7)
    t_model = ref["cnn_lstm"].CNNLSTM(OmegaConf.create(model_cfg))
    t_model.build()
    t_model.eval()
    # non-trivial BN running stats so the conversion is actually exercised
    with torch.no_grad():
        for mod in t_model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.6, 1.4)

    rng = np.random.RandomState(7)
    text = rng.randint(0, VOCAB, (B, NQ))
    image = rng.randn(B, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        t_scores = t_model(SimpleNamespace(
            text=torch.from_numpy(text), image=torch.from_numpy(image)
        ))["scores"].numpy()

    # ---- mmf_tpu model with converted weights ----
    registry.register("config", omega.create({"datasets": "clevr",
                                              "training": {}}))
    registry.register("clevr_text_vocab_size", VOCAB)
    registry.register("clevr_num_final_outputs", NUM_ANS)
    model = registry.get_model_class("cnn_lstm")(config=omega.create(model_cfg))
    batch = {"text": text, "image": image,
             "dataset_name": "clevr", "dataset_type": "val"}
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    params, batch_stats = variables["params"], variables["batch_stats"]

    sd = _np_sd(t_model)
    params["text_embedding"]["embedding"] = sd["text_embedding.weight"]
    for name, suffix in (("lstm_fwd", ""), ("lstm_bwd", "_reverse")):
        cell = _find_lstm_cell(params[name])
        cell.update(convert_torch_lstm_weights(
            sd[f"lstm.weight_ih_l0{suffix}"], sd[f"lstm.weight_hh_l0{suffix}"],
            sd[f"lstm.bias_ih_l0{suffix}"], sd[f"lstm.bias_hh_l0{suffix}"],
        ))
    for i in range(6):
        params[f"cnn_{i}"]["conv"] = {
            "kernel": sd[f"cnn.{i}.conv.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"cnn.{i}.conv.bias"],
        }
        params[f"cnn_{i}"]["norm"] = {
            "scale": sd[f"cnn.{i}.batch_norm_2d.weight"],
            "bias": sd[f"cnn.{i}.batch_norm_2d.bias"],
        }
        batch_stats[f"cnn_{i}"]["norm"] = {
            "mean": sd[f"cnn.{i}.batch_norm_2d.running_mean"],
            "var": sd[f"cnn.{i}.batch_norm_2d.running_var"],
        }
    params["classifier"]["module"]["out"] = {
        "kernel": np.ascontiguousarray(sd["classifier.module.layers.0.weight"].T),
        "bias": sd["classifier.module.layers.0.bias"],
    }

    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, False
    )
    np.testing.assert_allclose(np.asarray(out["scores"]), t_scores, atol=ATOL)


# ---------------------------------------------------------------------------
# fusion baselines (reference mmf/models/fusions.py:57-194)
# ---------------------------------------------------------------------------
V, H, L, HEADS, INTER = 30, 16, 2, 2, 64
NF, MH, T, B2, NUM_LABELS = 3, 5, 6, 2, 2

FUSION_CFG = {
    "direct_features_input": True,
    "num_features": NF,
    "modal_hidden_size": MH,
    "text_hidden_size": H,
    "num_labels": NUM_LABELS,
    "freeze_text": False,
    "freeze_modal": False,
    "freeze_complete_base": False,
    "modal_encoder": {"type": "identity", "params": {"in_dim": MH}},
    "text_encoder": {
        "type": "transformer",
        "params": {
            "bert_model_name": "bert-base-uncased",
            "random_init": True,
            "vocab_size": V, "hidden_size": H, "num_hidden_layers": L,
            "num_attention_heads": HEADS,
            "max_position_embeddings": 16, "num_segments": 2,
        },
    },
    "classifier": {"type": "mlp",
                   "params": {"in_dim": NF * MH + H, "out_dim": NUM_LABELS,
                              "num_layers": 0}},
    "modal_classifier": {"type": "mlp",
                         "params": {"in_dim": NF * MH,
                                    "out_dim": NUM_LABELS, "num_layers": 0}},
    "text_classifier": {"type": "mlp",
                        "params": {"in_dim": H, "out_dim": NUM_LABELS,
                                   "num_layers": 0}},
}


@pytest.fixture(scope="module")
def fusion_ref(ref):
    """Reference fusion models with TransformerEncoder pinned to a tiny
    local BertConfig (no hub download; random_init=True path)."""
    from transformers import BertConfig

    import mmf.models.fusions as ref_fusions
    import mmf.modules.encoders as ref_encoders

    tiny = BertConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=16, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    real = ref_encoders.TransformerEncoder._build_encoder_config
    ref_encoders.TransformerEncoder._build_encoder_config = (
        lambda self, config: tiny
    )
    yield ref_fusions
    ref_encoders.TransformerEncoder._build_encoder_config = real


def _fusion_batch():
    rng = np.random.RandomState(11)
    mask = np.ones((B2, T), np.int64)
    mask[1, 4:] = 0
    return {
        "input_ids": rng.randint(0, V, (B2, T)).astype(np.int64),
        "input_mask": mask,
        "segment_ids": np.zeros((B2, T), np.int64),
        "image_feature_0": rng.randn(B2, NF, MH).astype(np.float32),
        "dataset_name": "hateful_memes",
        "dataset_type": "val",
    }


def _ref_fusion_forward(fusion_ref, model_name, batch):
    import torch
    from omegaconf import OmegaConf

    cls = {"concat_bert": fusion_ref.ConcatBERT,
           "late_fusion": fusion_ref.LateFusion}[model_name]
    torch.manual_seed(13)
    t_model = cls(OmegaConf.create(FUSION_CFG))
    t_model.build()
    t_model.eval()
    sl = SimpleNamespace(
        input_ids=torch.from_numpy(batch["input_ids"]),
        input_mask=torch.from_numpy(batch["input_mask"]),
        segment_ids=torch.from_numpy(batch["segment_ids"]),
        image_feature_0=torch.from_numpy(batch["image_feature_0"]),
    )
    with torch.no_grad():
        t_scores = t_model(sl)["scores"].numpy()
    return t_model, t_scores


def _converted_fusion_params(t_model, model, batch):
    import jax

    from mmf_tpu.utils.checkpoint_updater import (
        HF_BERT_KEY_MAP,
        convert_torch_state_dict,
    )

    variables = model.init(jax.random.PRNGKey(0), batch, False)
    params = jax.tree_util.tree_map(np.asarray, variables)["params"]

    sd = _np_sd(t_model)
    # torch state_dict reaches the BertModelJit both as base.text.module.*
    # and through TransformerEncoder's embeddings alias; normalize both
    trunk_sd = {}
    for k, v in sd.items():
        if not k.startswith("base.text."):
            continue
        key = k[len("base.text."):]
        if key.startswith("module."):
            key = key[len("module."):]
        trunk_sd[key] = v
    # our FusionBase auto-names the text encoder; find it
    enc_name = next(k for k in params["base"]
                    if "transformer" in k.lower() or "Transformer" in k)
    converted, stats = convert_torch_state_dict(
        trunk_sd, params["base"][enc_name]["module"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    params["base"][enc_name]["module"] = converted
    for name in ("classifier", "text_classifier", "modal_classifier"):
        # build_classifier_layer may or may not leave a .module level
        key = next((k for k in (f"{name}.module.layers.0.weight",
                                f"{name}.layers.0.weight") if k in sd), None)
        if name in params and key is not None:
            params[name]["module"]["out"] = {
                "kernel": np.ascontiguousarray(sd[key].T),
                "bias": sd[key[:-len("weight")] + "bias"],
            }
    return params


@pytest.mark.parametrize("model_name", ["concat_bert", "late_fusion"])
def test_fusion_model_full_parity(fusion_ref, model_name):
    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega

    batch = _fusion_batch()
    t_model, t_scores = _ref_fusion_forward(fusion_ref, model_name, batch)

    registry.register("config", omega.create({"datasets": "hateful_memes",
                                              "training": {}}))
    model = registry.get_model_class(model_name)(
        config=omega.create(FUSION_CFG)
    )
    params = _converted_fusion_params(t_model, model, batch)
    out = model.apply({"params": params}, batch, False)
    np.testing.assert_allclose(np.asarray(out["scores"]), t_scores,
                               atol=ATOL)
