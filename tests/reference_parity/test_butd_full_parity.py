"""Full-model BUTD golden parity vs the torch reference
(mmf/models/butd.py:9-179) with converted weights at tiny dims:

- teacher-forced scores (reference prepare_data butd.py:54-79: text
  present + greedy inference => teacher forcing, also in eval), compared
  on the region the reference computes (t < caption_len-1 per sample);
- the greedy rollout (no text): argmax feedback chain through the
  top-down attention LSTM -> masked attention pooling -> language LSTM,
  which must match step-for-step for the whole unroll.

Weight-norm handling: torch `weight_norm(Linear)` (dim=0, per-row) maps
onto flax WeightNorm with feature_axes=-1 (fa_image/fa_hidden), dim=None
onto a scalar scale (attention transform); the reference's weight-normed
LanguageDecoder.fc is a plain Dense here, so its effective weight
g * v / ||v|| is materialized during conversion.
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
V, B, K, IMG_DIM = 11, 2, 3, 10
EMB, HID, ATT = 5, 7, 8
MAX_LEN = 6

MODEL_CFG = {
    "embedding_dim": EMB,
    "classifier": {
        "type": "language_decoder",
        "params": {"dropout": 0.0, "hidden_dim": HID,
                   "feature_dim": IMG_DIM, "fc_bias_init": 0},
    },
    "image_feature_embeddings": [{
        "modal_combine": {
            "type": "top_down_attention_lstm",
            "params": {"dropout": 0.0, "hidden_dim": HID,
                       "attention_dim": ATT},
        },
        "normalization": "softmax",
        "transform": {"type": "linear", "params": {"out_dim": 1}},
    }],
    "image_feature_dim": IMG_DIM,
    "image_feature_encodings": [{"type": "default", "params": {}}],
    "inference": {"type": "greedy", "params": {}},
}


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import torch
    from omegaconf import OmegaConf
    from mmf.common.registry import registry as ref_registry
    import mmf.models.butd as ref_butd

    ref_registry.register(
        "config", OmegaConf.create({"model": "butd", "datasets": "coco"})
    )

    class FakeVocab:
        SOS_INDEX = 1
        EOS_INDEX = 2

        def get_size(self):
            return V

        def get_embedding(self, cls, embedding_dim):
            torch.manual_seed(3)
            return cls(V, embedding_dim)

    class FakeCaptionProcessor:
        vocab = FakeVocab()
        max_length = MAX_LEN

    ref_registry.register("coco_text_processor", FakeCaptionProcessor())
    yield ref_butd
    shims.uninstall()


def _build_ref(ref):
    from omegaconf import OmegaConf

    m = ref.BUTD(
        OmegaConf.create(dict(MODEL_CFG, model_data_dir="/tmp",
                              losses=[{"type": "caption_cross_entropy"}]))
    )
    m.build()
    return m.eval()


def _batch(with_text):
    rng = np.random.RandomState(4)
    batch = {
        "image_feature_0": rng.randn(B, K, IMG_DIM).astype(np.float32),
        "image_info_0": {"max_features": np.array([3, 2], np.int64)},
        "answers": rng.randint(0, V, (B, 5, MAX_LEN)).astype(np.int64),
    }
    if with_text:
        # caption lens descending so the reference's length-sort is a no-op
        # (it reorders sample_list in place, butd.py:63-68)
        batch["caption_len"] = np.array([MAX_LEN, 4], np.int64)
        text = rng.randint(3, V, (B, MAX_LEN)).astype(np.int64)
        text[:, 0] = 1  # SOS
        batch["text"] = text
    return batch


def _ref_sample_list(batch):
    import torch
    from mmf.common.sample import SampleList

    sl = SampleList()
    sl.image_feature_0 = torch.from_numpy(batch["image_feature_0"])
    info = SampleList()
    info.max_features = torch.from_numpy(batch["image_info_0"]["max_features"])
    sl.image_info_0 = info
    sl.answers = torch.from_numpy(batch["answers"])
    if "text" in batch:
        sl.text = torch.from_numpy(batch["text"])
        sl.caption_len = torch.from_numpy(batch["caption_len"])
    sl.dataset_name = "coco"
    sl.dataset_type = "val"
    return sl


def _convert(sd, jparams):
    flat = dict(_flatten_flax(jparams))

    def put(path, value):
        key = tuple(path.split("/"))
        if key not in flat:
            # flax WeightNorm registers its scale under a single name
            # component containing slashes ("Dense_0/kernel/scale") —
            # try progressively merging trailing components.
            parts = path.split("/")
            for i in range(len(parts) - 1, 0, -1):
                cand = tuple(parts[:i]) + ("/".join(parts[i:]),)
                if cand in flat:
                    key = cand
                    break
        assert key in flat, f"no such flax param: {path}"
        assert flat[key].shape == np.shape(value), (
            f"{path}: {flat[key].shape} vs {np.shape(value)}"
        )
        flat[key] = np.asarray(value, np.float32)

    def put_lstm(jprefix, tprefix):
        cell = convert_torch_lstm_weights(
            sd[f"{tprefix}.weight_ih"], sd[f"{tprefix}.weight_hh"],
            sd[f"{tprefix}.bias_ih"], sd[f"{tprefix}.bias_hh"],
        )
        for name, leaves in cell.items():
            for leaf, val in leaves.items():
                put(f"{jprefix}/{name}/{leaf}", val)

    put("word_embedding/embedding", sd["word_embedding.weight"])

    att = "image_feature_embeddings_list.0.0.image_attention_model.module"
    tdl = f"{att}.combination_layer.module"
    put_lstm("step/top_down_attention/top_down_lstm", f"{tdl}.top_down_lstm")
    # fa_image / fa_hidden: torch weight_norm dim=0 (per-row g) -> flax
    # WeightNorm feature_axes=-1. The wrapped Dense registers as a sibling
    # (Dense_0/Dense_1) with the scale under the wrapper's name.
    put("step/top_down_attention/Dense_0/kernel",
        np.ascontiguousarray(sd[f"{tdl}.fa_image.weight_v"].T))
    put("step/top_down_attention/Dense_0/bias", sd[f"{tdl}.fa_image.bias"])
    put("step/top_down_attention/fa_image/Dense_0/kernel/scale",
        sd[f"{tdl}.fa_image.weight_g"].reshape(-1))
    put("step/top_down_attention/Dense_1/kernel",
        np.ascontiguousarray(sd[f"{tdl}.fa_hidden.weight_v"].T))
    put("step/top_down_attention/Dense_1/bias", sd[f"{tdl}.fa_hidden.bias"])
    put("step/top_down_attention/fa_hidden/Dense_1/kernel/scale",
        sd[f"{tdl}.fa_hidden.weight_g"].reshape(-1))
    # attention transform: weight_norm(Linear, dim=None) -> scalar scale
    put("step/Dense_0/kernel",
        np.ascontiguousarray(sd[f"{att}.transform.module.lc.weight_v"].T))
    put("step/Dense_0/bias", sd[f"{att}.transform.module.lc.bias"])
    put("step/attn_transform/Dense_0/kernel/scale",
        np.float32(sd[f"{att}.transform.module.lc.weight_g"].reshape(())))

    lm = "classifier.module"
    put_lstm("step/language_decoder/language_lstm", f"{lm}.language_lstm")
    # fc: weight-normed in the reference, plain Dense here -> materialize
    g = sd[f"{lm}.fc.weight_g"].reshape(-1, 1)
    v = sd[f"{lm}.fc.weight_v"]
    w_eff = g * v / np.linalg.norm(v, axis=1, keepdims=True)
    put("step/language_decoder/fc/kernel", np.ascontiguousarray(w_eff.T))
    put("step/language_decoder/fc/bias", sd[f"{lm}.fc.bias"])

    return _unflatten_flax(flat)


def _ours(batch, ref_model):
    import jax

    cfg = dict(MODEL_CFG, datasets="coco", text_vocab_size=V,
               max_length=MAX_LEN)
    model = registry.get_model_class("butd")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = _convert(sd, variables["params"])
    return np.asarray(
        model.apply({"params": params}, batch, False)["scores"]
    )


def test_butd_teacher_forced_parity(ref):
    import torch

    torch.manual_seed(31)
    tm = _build_ref(ref)
    batch = _batch(with_text=True)
    with torch.no_grad():
        t_scores = tm(_ref_sample_list(batch))["scores"].numpy()
    j_scores = _ours(batch, tm)
    assert t_scores.shape == (B, MAX_LEN, V)
    assert j_scores.shape == (B, MAX_LEN, V)
    # compare where the reference computed logits: t < caption_len - 1
    for i, clen in enumerate(batch["caption_len"]):
        np.testing.assert_allclose(
            j_scores[i, : clen - 1], t_scores[i, : clen - 1], atol=ATOL,
            err_msg=f"sample {i}",
        )


def test_butd_greedy_rollout_parity(ref):
    import torch

    torch.manual_seed(32)
    tm = _build_ref(ref)
    batch = _batch(with_text=False)
    with torch.no_grad():
        t_scores = tm(_ref_sample_list(batch))["scores"].numpy()
    j_scores = _ours(batch, tm)
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)
    # the argmax chains (the greedy captions) must agree exactly
    np.testing.assert_array_equal(
        j_scores.argmax(-1), t_scores.argmax(-1)
    )
