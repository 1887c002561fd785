"""Smoke tests for the remaining zoo models with no prior coverage:
lorra, multihead, top_down_bottom_up, concat_bow, unimodal_image,
visdial_multi_modal (the reference's construct-from-config + forward
pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)
B = 2
VOCAB = "tests/data/vocab.txt"


def _register_dataset_meta():
    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    registry.register("vqa2_num_final_outputs", 7)
    registry.register("vqa2_text_vocab_size", 50)


def _pythia_mc(**extra):
    base = {
        "model_data_dir": "",
        "classifier": {"type": "logit",
                       "params": {"img_hidden_dim": 16,
                                  "text_hidden_dim": 16}},
        "image_feature_embeddings": [
            {"modal_combine": {"type": "non_linear_element_multiply",
                               "params": {"dropout": 0, "hidden_dim": 16}},
             "normalization": "softmax",
             "transform": {"type": "linear", "params": {"out_dim": 1}}}
        ],
        "image_feature_dim": 64,
        "image_feature_encodings": [
            {"type": "default", "params": {"in_dim": 64}}
        ],
        "image_text_modal_combine": {
            "type": "non_linear_element_multiply",
            "params": {"dropout": 0, "hidden_dim": 16},
        },
        "text_embeddings": [
            {"type": "attention",
             "params": {"hidden_dim": 16, "num_layers": 1, "conv1_out": 8,
                        "conv2_out": 2, "dropout": 0, "embedding_dim": 300,
                        "kernel_size": 1, "padding": 0}}
        ],
    }
    base.update(extra)
    return omega.create(base)


def _vqa_batch(feat_dim=64, n_regions=5, text_len=6, **extra):
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(0, 50, (B, text_len))),
        "text_mask": jnp.ones((B, text_len), jnp.int32),
        "image_feature_0": jnp.asarray(
            rng.randn(B, n_regions, feat_dim).astype(np.float32)
        ),
        "image_info_0": {"max_features": jnp.asarray([n_regions, 3])},
        "dataset_name": "vqa2",
        "dataset_type": "train",
    }
    batch.update(extra)
    return batch


def _run(name, mc, batch):
    cls = registry.get_model_class(name)
    model = cls(config=mc)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert np.isfinite(np.asarray(out["scores"])).all(), name
    return out["scores"]


def test_lorra():
    """Pythia + OCR context branch with order vectors."""
    _register_dataset_meta()
    mc = _pythia_mc(
        context_feature_dim=30,
        context_feature_encodings=[{"type": "default",
                                    "params": {"in_dim": 30}}],
        context_feature_embeddings=[
            {"modal_combine": {"type": "non_linear_element_multiply",
                               "params": {"dropout": 0, "hidden_dim": 16}},
             "normalization": "softmax",
             "transform": {"type": "linear", "params": {"out_dim": 1}}}
        ],
        context_max_features=4,
    )
    rng = np.random.RandomState(1)
    batch = _vqa_batch(
        context_feature_0=jnp.asarray(
            rng.randn(B, 4, 30).astype(np.float32)),
        context_info_0={"max_features": jnp.asarray([4, 2])},
        order_vectors=jnp.zeros((B, 4, 4), jnp.float32),
    )
    scores = _run("lorra", mc, batch)
    assert scores.shape == (B, 7)


def test_pythia_multihead():
    _register_dataset_meta()
    mc = _pythia_mc()
    mc["image_feature_embeddings"] = [
        {"num_heads": 2, "hidden_dim": 16}
    ]
    scores = _run("multihead", mc, _vqa_batch())
    assert scores.shape == (B, 7)


def test_top_down_bottom_up():
    _register_dataset_meta()
    mc = omega.create({
        "hidden_dim": 16,
        "num_labels": 7,
        "text_vocab_size": 50,
        "embedding_dim": 32,
        "text_embedding": {"type": "bilstm",
                           "params": {"hidden_dim": 16,
                                      "embedding_dim": 32}},
        "classifier": {"type": "weight_norm",
                       "params": {"hidden_dim": 16, "dropout": 0}},
    })
    scores = _run("top_down_bottom_up", mc, _vqa_batch())
    assert scores.shape == (B, 7)


def test_concat_bow():
    mc = omega.create({
        "direct_features_input": True,
        "num_labels": 2,
        "modal_hidden_size": 64,
        "text_hidden_size": 16,
        "text_encoder": {
            "type": "text_embedding",
            "params": {"operator": "sum",
                       "embedding_params": {
                           "type": "torch",
                           "params": {"vocab_size": 50,
                                      "embedding_dim": 16}}},
        },
        "classifier": {"type": "mlp",
                       "params": {"num_layers": 1, "hidden_dim": 16}},
    })
    batch = _vqa_batch(feat_dim=64, n_regions=1)
    scores = _run("concat_bow", mc, batch)
    assert scores.shape[0] == B and scores.shape[-1] == 2


def test_unimodal_image():
    mc = omega.create({
        "direct_features_input": True,
        "num_labels": 2,
        "modal_hidden_size": 64,
        "classifier": {"type": "mlp",
                       "params": {"num_layers": 1, "hidden_dim": 16}},
    })
    batch = _vqa_batch(feat_dim=64, n_regions=1)
    scores = _run("unimodal_image", mc, batch)
    assert scores.shape[0] == B and scores.shape[-1] == 2


def test_visdial_multi_modal():
    _register_dataset_meta()
    mc = _pythia_mc(
        decoder={"params": {"embedding_dim": 16, "hidden_dim": 16}},
    )
    rng = np.random.RandomState(2)
    D, OPTS, S = 1, 3, 4
    batch = _vqa_batch(
        answer_options=jnp.asarray(
            rng.randint(0, 50, (B, D, OPTS, S))),
        answer_options_len=jnp.full((B, D, OPTS), S, jnp.int32),
        history=jnp.asarray(rng.randint(0, 50, (B, 6))),
        vocab_size=50,
    )
    scores = _run("visdial_multi_modal", mc, batch)
    assert scores.shape == (B * D, OPTS)

    # the history arm must reach the joint embedding (context arm of the
    # 3-way combine, reference forward:86-89)
    cls = registry.get_model_class("visdial_multi_modal")
    model = cls(config=mc)
    variables = model.init(RNG, batch, False)
    out1 = np.asarray(model.apply(variables, batch, False)["scores"])
    b2 = dict(batch)
    b2["history"] = jnp.asarray(rng.randint(0, 50, (B, 6)))
    out2 = np.asarray(model.apply(variables, b2, False)["scores"])
    assert not np.allclose(out1, out2)

    # options are embedded by the SHARED question stack: perturbing a
    # word-embedding row used only by the options must move the scores
    import jax as _jax
    params = variables["params"]
    emb = np.asarray(params["word_embedding"]["embedding"]).copy()
    opt_tok = int(np.asarray(batch["answer_options"])[0, 0, 0, 0])
    emb[opt_tok] += 1.0
    params2 = _jax.tree_util.tree_map(lambda x: x, params)
    params2["word_embedding"]["embedding"] = jnp.asarray(emb)
    out3 = np.asarray(model.apply({"params": params2}, batch, False)["scores"])
    assert not np.allclose(out1, out3)
