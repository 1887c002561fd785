"""Full-model LoRRA golden parity vs the torch reference
(mmf/models/lorra.py:7-63) with converted weights at tiny dims: Pythia's
trunk plus the OCR context branch — sigmoid-normalized context attention,
order vectors concatenated onto context features before attention pooling
(embeddings.py:253-258), fa_context arm in the combine layer, and the
[image*text ; context*text] concatenation feeding the classifier
(layers.py:393-397).
"""

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports

from tests.reference_parity.test_pythia_full_parity import (
    MODEL_CFG as PYTHIA_CFG,
    V, B, T, K, IMG_DIM, NUM_ANS,
    _batch as _pythia_batch,
    _convert as _convert_pythia,
    _ref_sample_list as _pythia_sample_list,
)
from mmf_tpu.utils.checkpoint_updater import _flatten_flax, _unflatten_flax

setup_imports()

ATOL = 2e-5
KC, CTX_DIM, ORDER_DIM = 4, 6, 3

LORRA_CFG = dict(
    PYTHIA_CFG,
    context_feature_dim=CTX_DIM,
    context_max_len=KC,
    num_context_features=1,
    context_feature_embeddings=[{
        "modal_combine": {
            "type": "non_linear_element_multiply",
            "params": {"dropout": 0, "hidden_dim": 12},
        },
        "normalization": "sigmoid",
        "transform": {"type": "linear", "params": {"out_dim": 1}},
    }],
    context_feature_encodings=[{"type": "default", "params": {}}],
    context_embeddings=[{
        "type": "identity",
        "params": {"embedding_dim": CTX_DIM + ORDER_DIM},
    }],
    image_text_modal_combine={
        "type": "non_linear_element_multiply",
        "params": {"dropout": 0, "hidden_dim": 12,
                   "context_dim": CTX_DIM + ORDER_DIM},
    },
)


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import torch
    from omegaconf import OmegaConf
    from mmf.common.registry import registry as ref_registry
    import mmf.models.lorra as ref_lorra

    ref_registry.register(
        "config", OmegaConf.create({"model": "lorra", "datasets": "textvqa"})
    )
    ref_registry.register("textvqa_num_final_outputs", NUM_ANS)

    class FakeVocab:
        def get_embedding(self, cls, embedding_dim):
            torch.manual_seed(3)
            return cls(V, embedding_dim)

    class FakeTextProcessor:
        vocab = FakeVocab()

    ref_registry.register("textvqa_text_processor", FakeTextProcessor())
    yield ref_lorra
    shims.uninstall()


def _batch():
    rng = np.random.RandomState(7)
    batch = _pythia_batch()
    batch["context_feature_0"] = rng.randn(B, KC, CTX_DIM).astype(np.float32)
    batch["context_info_0"] = {"max_features": np.array([4, 2], np.int64)}
    # one-hot order vectors, zeroed past each sample's real OCR count
    order = np.zeros((B, KC, ORDER_DIM), np.float32)
    for b in range(B):
        for k in range(KC):
            order[b, k, k % ORDER_DIM] = 1.0
    batch["order_vectors"] = order
    return batch


def _ref_sample_list(batch, ref_model):
    import torch

    sl = _pythia_sample_list(batch)
    from mmf.common.sample import SampleList

    sl.context_feature_0 = torch.from_numpy(batch["context_feature_0"])
    info = SampleList()
    info.max_features = torch.from_numpy(
        batch["context_info_0"]["max_features"]
    )
    sl.context_info_0 = info
    sl.order_vectors = torch.from_numpy(batch["order_vectors"])
    return sl


def _convert(sd, jparams):
    """Pythia mappings + LoRRA's context attention and fa_context arm."""
    converted = _convert_pythia(sd, jparams)
    flat = dict(_flatten_flax(converted))

    def put(path, value):
        key = tuple(path.split("/"))
        assert key in flat, f"no such flax param: {path}"
        assert flat[key].shape == np.shape(value), (
            f"{path}: {flat[key].shape} vs {np.shape(value)}"
        )
        flat[key] = np.asarray(value, np.float32)

    def put_wn(jprefix, tprefix):
        g, v = sd[f"{tprefix}.weight_g"], sd[f"{tprefix}.weight_v"]
        put(f"{jprefix}/Dense_0/kernel", np.ascontiguousarray(v.T))
        put(f"{jprefix}/Dense_0/bias", sd[f"{tprefix}.bias"])
        p = tuple(jprefix.split("/"))
        hits = [k for k in flat
                if k[:len(p)] == p and k[-1].endswith("scale")]
        assert len(hits) == 1, f"scale leaf not found under {jprefix}: {hits}"
        flat[hits[0]] = np.float32(g.reshape(()))

    att = "context_feature_embeddings_0_0/image_attention_model/module"
    t_att = "context_feature_embeddings_list.0.0.image_attention_model.module"
    for arm in ("fa_image", "fa_txt"):
        put_wn(f"{att}/combination_layer/module/{arm}",
               f"{t_att}.combination_layer.module.{arm}.layers.0")
    put_wn(f"{att}/transform/module", f"{t_att}.transform.module.lc")

    put_wn("image_text_multi_modal_combine_layer/module/fa_context",
           "image_text_multi_modal_combine_layer.module.fa_context.layers.0")

    return _unflatten_flax(flat)


def test_lorra_full_forward_parity(ref):
    import jax
    import torch
    from omegaconf import OmegaConf

    torch.manual_seed(21)
    tm = ref.LoRRA(
        OmegaConf.create(dict(LORRA_CFG, model_data_dir="/tmp",
                              losses=[{"type": "logit_bce"}]))
    )
    tm.build()
    tm = tm.eval()

    batch = _batch()
    with torch.no_grad():
        t_scores = tm(_ref_sample_list(batch, tm))["scores"].numpy()

    cfg = dict(LORRA_CFG, datasets="textvqa", text_vocab_size=V,
               num_labels=NUM_ANS)
    model = registry.get_model_class("lorra")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = _convert(sd, variables["params"])
    j_scores = np.asarray(
        model.apply({"params": params}, batch, False)["scores"]
    )

    assert t_scores.shape == j_scores.shape == (B, NUM_ANS)
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)


def test_lorra_context_branch_matters(ref):
    """The context features must actually reach the scores (guards against
    a silently-dropped context branch)."""
    import jax

    cfg = dict(LORRA_CFG, datasets="textvqa", text_vocab_size=V,
               num_labels=NUM_ANS)
    model = registry.get_model_class("lorra")(config=cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(1), batch, False)
    s1 = np.asarray(model.apply(variables, batch, False)["scores"])
    b2 = dict(batch)
    b2["context_feature_0"] = batch["context_feature_0"] + 1.0
    s2 = np.asarray(model.apply(variables, b2, False)["scores"])
    assert not np.allclose(s1, s2), "context features had no effect"
