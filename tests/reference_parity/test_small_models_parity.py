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


# ---------------------------------------------------------------------------
# unimodal baselines (reference mmf/models/unimodal.py:41-110)
# ---------------------------------------------------------------------------
def test_unimodal_text_full_parity(fusion_ref):
    import torch
    from omegaconf import OmegaConf

    import mmf.models.unimodal as ref_unimodal

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega

    cfg = {
        "text_hidden_size": H,
        "num_labels": NUM_LABELS,
        "text_encoder": dict(FUSION_CFG["text_encoder"]),
        "classifier": {"type": "mlp",
                       "params": {"in_dim": H, "out_dim": NUM_LABELS,
                                  "num_layers": 0}},
    }
    torch.manual_seed(17)
    t_model = ref_unimodal.UnimodalText(OmegaConf.create(cfg))
    t_model.build()
    t_model.eval()

    batch = _fusion_batch()
    sl = SimpleNamespace(
        input_ids=torch.from_numpy(batch["input_ids"]),
        input_mask=torch.from_numpy(batch["input_mask"]),
        segment_ids=torch.from_numpy(batch["segment_ids"]),
    )
    sl.__contains__ = lambda self, k: hasattr(self, k)
    with torch.no_grad():
        t_scores = t_model(_DictNS(vars(sl)))["scores"].numpy()

    registry.register("config", omega.create({"datasets": "hateful_memes",
                                              "training": {}}))
    model = registry.get_model_class("unimodal_text")(config=omega.create(cfg))

    import jax
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    params = jax.tree_util.tree_map(np.asarray, variables)["params"]

    from mmf_tpu.utils.checkpoint_updater import (
        HF_BERT_KEY_MAP,
        convert_torch_state_dict,
    )
    sd = _np_sd(t_model)
    trunk_sd = {}
    for k, v in sd.items():
        if not k.startswith("base.encoder."):
            continue
        key = k[len("base.encoder."):]
        if key.startswith("module."):
            key = key[len("module."):]
        trunk_sd[key] = v
    enc_name = next(k for k in params if "transformer" in k.lower())
    converted, stats = convert_torch_state_dict(
        trunk_sd, params[enc_name]["module"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    params[enc_name]["module"] = converted
    key = next(k for k in (f"classifier.module.layers.0.weight",
                           f"classifier.layers.0.weight") if k in sd)
    params["classifier"]["module"]["out"] = {
        "kernel": np.ascontiguousarray(sd[key].T),
        "bias": sd[key[:-len("weight")] + "bias"],
    }
    out = model.apply({"params": params}, batch, False)
    np.testing.assert_allclose(np.asarray(out["scores"]), t_scores,
                               atol=ATOL)


class _DictNS(SimpleNamespace):
    """SampleList stand-in: attribute access + `in` membership."""

    def __init__(self, d):
        super().__init__(**d)

    def __contains__(self, key):
        return hasattr(self, key)


def test_unimodal_image_full_parity(ref):
    import jax
    import torch
    from omegaconf import OmegaConf

    import mmf.models.unimodal as ref_unimodal

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega

    OUT = 12
    cfg = {
        "direct_features_input": True,
        "modal_hidden_size": OUT,
        "num_labels": NUM_LABELS,
        "modal_encoder": {
            "type": "projection",
            "params": {"in_dim": MH, "out_dim": OUT,
                       "num_output_features": 1},
        },
        "classifier": {"type": "mlp",
                       "params": {"in_dim": OUT, "out_dim": NUM_LABELS,
                                  "num_layers": 0}},
    }
    torch.manual_seed(19)
    t_model = ref_unimodal.UnimodalModal(OmegaConf.create(cfg))
    t_model.build()
    t_model.eval()

    rng = np.random.RandomState(23)
    feats = rng.randn(B2, NF, MH).astype(np.float32)
    with torch.no_grad():
        t_scores = t_model(_DictNS(
            {"image_feature_0": torch.from_numpy(feats)}
        ))["scores"].numpy()

    registry.register("config", omega.create({"datasets": "hateful_memes",
                                              "training": {}}))
    model = registry.get_model_class("unimodal_image")(
        config=omega.create(cfg)
    )
    batch = {"image_feature_0": feats, "dataset_name": "hateful_memes",
             "dataset_type": "val"}
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    params = jax.tree_util.tree_map(np.asarray, variables)["params"]

    sd = _np_sd(t_model)
    proj_w = next(v for k, v in sd.items()
                  if "layers.weight" in k and k.startswith("base."))
    proj_b = next(v for k, v in sd.items()
                  if "layers.bias" in k and k.startswith("base."))
    enc_name = next(k for k in params if "projection" in k.lower()
                    or "Projection" in k)
    params[enc_name]["layers"] = {
        "kernel": np.ascontiguousarray(proj_w.T), "bias": proj_b,
    }
    key = next(k for k in ("classifier.module.layers.0.weight",
                           "classifier.layers.0.weight") if k in sd)
    params["classifier"]["module"]["out"] = {
        "kernel": np.ascontiguousarray(sd[key].T),
        "bias": sd[key[:-len("weight")] + "bias"],
    }
    out = model.apply({"params": params}, batch, False)
    np.testing.assert_allclose(np.asarray(out["scores"]), t_scores,
                               atol=ATOL)


# ---------------------------------------------------------------------------
# cm_shared_transformer (reference mmf/models/alignment.py:106-253)
# ---------------------------------------------------------------------------
def test_cm_shared_transformer_full_parity(fusion_ref):
    import jax
    import torch
    from omegaconf import OmegaConf

    import mmf.models.alignment as ref_alignment

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega
    from mmf_tpu.utils.checkpoint_updater import (
        HF_BERT_KEY_MAP,
        convert_torch_state_dict,
    )

    FINAL, IN_IMG, GRID = 8, 10, 49  # 7x7 grid exercises the sine pos emb
    cfg = {
        "final_hidden_size": FINAL,
        "norm_img_embeddings": False,
        "norm_text_embeddings": True,
        "direct_features_input": False,
        "image_encoder": {"type": "identity", "params": {"in_dim": IN_IMG}},
        "text_encoder": dict(FUSION_CFG["text_encoder"]),
        "image_projection": {"type": "linear",
                             "params": {"in_dim": IN_IMG, "out_dim": FINAL}},
        "text_projection": {"type": "linear",
                            "params": {"in_dim": H, "out_dim": FINAL}},
    }
    torch.manual_seed(29)
    t_model = ref_alignment.CMSharedTransformer(OmegaConf.create(cfg))
    t_model.eval()

    rng = np.random.RandomState(31)
    batch = {
        "input_ids": rng.randint(0, V, (B2, T)).astype(np.int64),
        "input_mask": np.concatenate(
            [np.ones((B2, T - 2), np.int64), np.zeros((B2, 2), np.int64)], 1
        ),
        "segment_ids": np.zeros((B2, T), np.int64),
        "image": rng.randn(B2, GRID, IN_IMG).astype(np.float32),
        "dataset_name": "flickr30k", "dataset_type": "val",
    }
    with torch.no_grad():
        t_out = t_model(_DictNS({
            k: torch.from_numpy(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }))
    t_scores = t_out["scores"].numpy()
    t_targets = t_out["targets"].numpy()

    registry.register("config", omega.create({"datasets": "flickr30k",
                                              "training": {}}))
    model = registry.get_model_class("cm_shared_transformer")(
        config=omega.create(cfg)
    )
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    params = jax.tree_util.tree_map(np.asarray, variables)["params"]
    sd = _np_sd(t_model)

    # trunk
    trunk_sd = {}
    for k, v in sd.items():
        if k.startswith("text_encoder."):
            key = k[len("text_encoder."):]
            if key.startswith("module."):
                key = key[len("module."):]
            trunk_sd[key] = v
    enc_name = next(k for k in params if "transformer" in k.lower()
                    and k != "shared_transformer_0")
    converted, stats = convert_torch_state_dict(
        trunk_sd, params[enc_name]["module"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    params[enc_name]["module"] = converted

    # projections (ClassifierLayer type=linear -> possibly .module level)
    for ours, theirs in (("text_projection", "text_proj"),
                         ("image_projection", "image_proj")):
        wkey = next(k for k in (f"{theirs}.module.weight", f"{theirs}.weight")
                    if k in sd)
        params[ours] = {"kernel": np.ascontiguousarray(sd[wkey].T),
                        "bias": sd[wkey[:-len("weight")] + "bias"]}

    # shared transformer: torch packed qkv -> our per-gate denses
    for i in range(2):
        p = f"shared_transformer.layers.{i}."
        lp = params[f"shared_transformer_{i}"]
        wq, wk, wv = np.split(sd[p + "self_attn.in_proj_weight"], 3, axis=0)
        bq, bk, bv = np.split(sd[p + "self_attn.in_proj_bias"], 3, axis=0)
        att = lp["attention"]
        att["query"] = {"kernel": np.ascontiguousarray(wq.T), "bias": bq}
        att["key"] = {"kernel": np.ascontiguousarray(wk.T), "bias": bk}
        att["value"] = {"kernel": np.ascontiguousarray(wv.T), "bias": bv}
        att["output_dense"] = {
            "kernel": np.ascontiguousarray(sd[p + "self_attn.out_proj.weight"].T),
            "bias": sd[p + "self_attn.out_proj.bias"],
        }
        att["output_layer_norm"] = {"scale": sd[p + "norm1.weight"],
                                    "bias": sd[p + "norm1.bias"]}
        ffn = lp["ffn"]
        ffn["intermediate_dense"] = {
            "kernel": np.ascontiguousarray(sd[p + "linear1.weight"].T),
            "bias": sd[p + "linear1.bias"],
        }
        ffn["output_dense"] = {
            "kernel": np.ascontiguousarray(sd[p + "linear2.weight"].T),
            "bias": sd[p + "linear2.bias"],
        }
        ffn["output_layer_norm"] = {"scale": sd[p + "norm2.weight"],
                                    "bias": sd[p + "norm2.bias"]}

    # attention pools
    for pool in ("text_pool", "image_pool"):
        params[pool]["lin1"] = {
            "kernel": np.ascontiguousarray(sd[f"{pool}.linear.0.weight"].T),
            "bias": sd[f"{pool}.linear.0.bias"],
        }
        params[pool]["lin2"] = {
            "kernel": np.ascontiguousarray(sd[f"{pool}.linear.3.weight"].T),
            "bias": sd[f"{pool}.linear.3.bias"],
        }

    out = model.apply({"params": params}, batch, False)
    np.testing.assert_allclose(np.asarray(out["scores"]), t_scores,
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out["targets"]), t_targets,
                               atol=ATOL)
