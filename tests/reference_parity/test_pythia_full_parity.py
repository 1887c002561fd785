"""Full-model Pythia golden parity vs the torch reference
(mmf/models/pythia.py:19-401) with converted weights at tiny dims:
the complete forward (word embedding -> LSTM+conv attention text embedding
-> top-down image attention with location masking -> element-multiply
fusion -> two-branch logit classifier), plus the pythia_image_only /
pythia_question_only ablations' single-branch routing
(reference pythia.py:310-361).
"""

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.checkpoint_updater import (
    _flatten_flax,
    _unflatten_flax,
    convert_torch_lstm_weights,
)
from mmf_tpu.utils.env import setup_imports

setup_imports()

ATOL = 2e-5
V, B, T, K, IMG_DIM, NUM_ANS = 13, 2, 4, 3, 10, 5

MODEL_CFG = {
    "classifier": {
        "type": "logit",
        "params": {"img_hidden_dim": 7, "text_hidden_dim": 9},
    },
    "image_feature_embeddings": [{
        "modal_combine": {
            "type": "non_linear_element_multiply",
            "params": {"dropout": 0, "hidden_dim": 12},
        },
        "normalization": "softmax",
        "transform": {"type": "linear", "params": {"out_dim": 1}},
    }],
    "image_feature_dim": IMG_DIM,
    "image_feature_encodings": [{"type": "default", "params": {}}],
    "image_text_modal_combine": {
        "type": "non_linear_element_multiply",
        "params": {"dropout": 0, "hidden_dim": 12},
    },
    "text_embeddings": [{
        "type": "attention",
        "params": {"hidden_dim": 8, "num_layers": 1, "conv1_out": 6,
                   "conv2_out": 2, "dropout": 0, "embedding_dim": 300,
                   "kernel_size": 1, "padding": 0},
    }],
}


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import torch
    from omegaconf import OmegaConf
    from mmf.common.registry import registry as ref_registry
    import mmf.models.pythia as ref_pythia

    ref_registry.register(
        "config", OmegaConf.create({"model": "pythia", "datasets": "vqa2"})
    )
    ref_registry.register("vqa2_num_final_outputs", NUM_ANS)

    class FakeVocab:
        def get_embedding(self, cls, embedding_dim):
            torch.manual_seed(3)
            return cls(V, embedding_dim)

    class FakeTextProcessor:
        vocab = FakeVocab()

    ref_registry.register("vqa2_text_processor", FakeTextProcessor())
    yield ref_pythia
    shims.uninstall()


def _build_ref(ref, cls_name="Pythia"):
    from omegaconf import OmegaConf

    m = getattr(ref, cls_name)(
        OmegaConf.create(dict(MODEL_CFG, model_data_dir="/tmp",
                              losses=[{"type": "logit_bce"}]))
    )
    m.build()
    return m.eval()


def _batch():
    rng = np.random.RandomState(0)
    return {
        "text": (np.arange(B * T).reshape(B, T) % V).astype(np.int32),
        "image_feature_0": rng.randn(B, K, IMG_DIM).astype(np.float32),
        "image_info_0": {"max_features": np.array([3, 2], np.int64)},
    }


def _ref_sample_list(batch, embed_text=False, ref_model=None):
    import torch
    from mmf.common.sample import SampleList

    sl = SampleList()
    if embed_text:
        # the ablation forwards skip word_embedding (reference
        # pythia.py:316,342): text must arrive pre-embedded (values are
        # irrelevant for question_only — it zeroes them)
        with torch.no_grad():
            sl.text = ref_model.word_embedding(
                torch.from_numpy(batch["text"]).long()
            )
    else:
        sl.text = torch.from_numpy(batch["text"]).long()
    sl.image_feature_0 = torch.from_numpy(batch["image_feature_0"])
    info = SampleList()
    info.max_features = torch.from_numpy(batch["image_info_0"]["max_features"])
    sl.image_info_0 = info
    return sl


def _wn(sd, prefix):
    """torch weight_norm(Linear, dim=None) -> flax WeightNorm(Dense) subtree."""
    g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
    return (
        {"kernel": np.ascontiguousarray(v.T), "bias": sd[f"{prefix}.bias"]},
        np.float32(g.reshape(())),
    )


def _convert(sd, jparams):
    """Map the torch Pythia state_dict onto our flax param tree."""
    flat = _flatten_flax(jparams)
    out = dict(flat)

    def put(path, value):
        key = tuple(path.split("/"))
        assert key in flat, f"no such flax param: {path}"
        assert flat[key].shape == np.shape(value), (
            f"{path}: {flat[key].shape} vs {np.shape(value)}"
        )
        out[key] = np.asarray(value, np.float32)

    def put_scale(jprefix, scale):
        # flax WeightNorm stores the norm scale under a single leaf key
        # literally named "Dense_0/kernel/scale" — find it in the real tree
        p = tuple(jprefix.split("/"))
        hits = [k for k in flat
                if k[:len(p)] == p and k[-1].endswith("scale")]
        assert len(hits) == 1, f"scale leaf not found under {jprefix}: {hits}"
        out[hits[0]] = np.float32(scale)

    def put_wn(jprefix, tprefix):
        dense, scale = _wn(sd, tprefix)
        put(f"{jprefix}/Dense_0/kernel", dense["kernel"])
        put(f"{jprefix}/Dense_0/bias", dense["bias"])
        put_scale(jprefix, scale)

    put("word_embedding/embedding", sd["word_embedding.weight"])

    te = "text_embeddings_0/module"
    cell = convert_torch_lstm_weights(
        sd["text_embeddings.0.module.recurrent_unit.weight_ih_l0"],
        sd["text_embeddings.0.module.recurrent_unit.weight_hh_l0"],
        sd["text_embeddings.0.module.recurrent_unit.bias_ih_l0"],
        sd["text_embeddings.0.module.recurrent_unit.bias_hh_l0"],
    )
    for name, leaves in cell.items():
        for leaf, val in leaves.items():
            put(f"{te}/lstm_0_fwd/{name}/{leaf}", val)
    for conv in ("conv1", "conv2"):
        put(f"{te}/{conv}/kernel",
            sd[f"text_embeddings.0.module.{conv}.weight"].transpose(2, 1, 0))
        put(f"{te}/{conv}/bias", sd[f"text_embeddings.0.module.{conv}.bias"])

    att = "image_feature_embeddings_0_0/image_attention_model/module"
    t_att = "image_feature_embeddings_list.0.0.image_attention_model.module"
    for arm in ("fa_image", "fa_txt"):
        put_wn(f"{att}/combination_layer/module/{arm}",
               f"{t_att}.combination_layer.module.{arm}.layers.0")
    tr_dense, tr_scale = _wn(sd, f"{t_att}.transform.module.lc")
    put(f"{att}/transform/module/Dense_0/kernel", tr_dense["kernel"])
    put(f"{att}/transform/module/Dense_0/bias", tr_dense["bias"])
    put_scale(f"{att}/transform/module", tr_scale)

    for arm in ("fa_image", "fa_txt"):
        put_wn(f"image_text_multi_modal_combine_layer/module/{arm}",
               f"image_text_multi_modal_combine_layer.module.{arm}.layers.0")

    for branch, hid in (("text", 9), ("image", 7)):
        put_wn(f"classifier/module/f_o_{branch}",
               f"classifier.module.f_o_{branch}.layers.0")
        put(f"classifier/module/linear_{branch}/kernel",
            sd[f"classifier.module.linear_{branch}.weight"].T)
        put(f"classifier/module/linear_{branch}/bias",
            sd[f"classifier.module.linear_{branch}.bias"])

    return _unflatten_flax(out)


def _ours(registry_key, batch, ref_model, drop_missing=False):
    import jax

    cfg = dict(MODEL_CFG, datasets="vqa2", text_vocab_size=V,
               num_labels=NUM_ANS)
    model = registry.get_model_class(registry_key)(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    if drop_missing:
        # ablation models materialize only the branch they call; convert
        # against the FULL tree then filter to what this model owns
        import copy
        full_cfg = dict(MODEL_CFG, datasets="vqa2", text_vocab_size=V,
                        num_labels=NUM_ANS)
        full = registry.get_model_class("pythia")(config=full_cfg)
        full_vars = full.init(jax.random.PRNGKey(0), batch, False)
        converted = _flatten_flax(_convert(sd, full_vars["params"]))
        own = _flatten_flax(variables["params"])
        params = _unflatten_flax({k: converted[k] for k in own})
    else:
        params = _convert(sd, variables["params"])
    return np.asarray(model.apply({"params": params}, batch, False)["scores"])


def test_pythia_full_forward_parity(ref):
    import torch

    torch.manual_seed(11)
    tm = _build_ref(ref)
    batch = _batch()
    with torch.no_grad():
        t_scores = tm(_ref_sample_list(batch))["scores"].numpy()
    j_scores = _ours("pythia", batch, tm)
    assert t_scores.shape == j_scores.shape == (B, NUM_ANS)
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)


def test_pythia_image_only_parity(ref):
    import torch

    torch.manual_seed(12)
    tm = _build_ref(ref, "PythiaImageOnly")
    batch = _batch()
    with torch.no_grad():
        t_scores = tm(
            _ref_sample_list(batch, embed_text=True, ref_model=tm)
        )["scores"].numpy()
    j_scores = _ours("pythia_image_only", batch, tm, drop_missing=True)
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)


def test_pythia_question_only_parity(ref):
    import torch

    torch.manual_seed(13)
    tm = _build_ref(ref, "PythiaQuestionOnly")
    batch = _batch()
    with torch.no_grad():
        t_scores = tm(
            _ref_sample_list(batch, embed_text=True, ref_model=tm)
        )["scores"].numpy()
    j_scores = _ours("pythia_question_only", batch, tm, drop_missing=True)
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)
