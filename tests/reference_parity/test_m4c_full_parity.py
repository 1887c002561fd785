"""Full-model M4C golden parity vs the torch reference
(mmf/models/m4c.py M4C.forward): TextBert + 768->mmt projection, the
obj/ocr feature branches (fc7 finetune encoders loaded from pickles,
L2-normalize, feat/bbox LayerNorm sums), the joint MMT, classifier and
OCR pointer net — teacher-forced train scores AND the full greedy eval
decode (our incremental prefix-KV scan vs the reference's
recompute-everything loop) with converted weights."""

import os
import pickle

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import (
    HF_BERT_KEY_MAP,
    convert_torch_state_dict,
)
from mmf_tpu.utils.env import setup_imports

setup_imports()

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 3e-5

B, N_OBJ, N_OCR, T_TXT, T_DEC = 2, 3, 3, 5, 6
FC7_OUT = 2048
ORDER_DIM = 50
OCR_MAX_NUM = 50
NUM_FINAL = 60  # classifier out = 60 - 50 = 10
MMT_H = 32


@pytest.fixture(scope="module")
def ref_m4c(tmp_path_factory):
    from tests.reference_parity import shims

    shims.install()
    import torch
    from mmf.common.registry import registry as torch_registry
    from omegaconf import OmegaConf

    import mmf.models.m4c as ref_m4c_mod

    data_dir = tmp_path_factory.mktemp("m4c_data")
    det = data_dir / "models" / "detectron.defaults"
    det.mkdir(parents=True)
    rng = np.random.RandomState(7)
    with open(det / "fc7_w.pkl", "wb") as f:
        pickle.dump(
            (rng.randn(FC7_OUT, 2048) * 0.01).astype(np.float32), f
        )
    with open(det / "fc7_b.pkl", "wb") as f:
        pickle.dump(rng.randn(FC7_OUT).astype(np.float32) * 0.01, f)

    torch_registry.register("config", OmegaConf.create({"datasets": "textvqa"}))
    torch_registry.register("textvqa_num_final_outputs", NUM_FINAL)
    # the reference itself fakes the processor this way for pretrained
    # loads (m4c.py:update_registry_for_pretrained)
    torch_registry.register(
        "textvqa_answer_processor", OmegaConf.create({"BOS_IDX": 1})
    )

    config = OmegaConf.create(
        {
            "model_data_dir": str(data_dir),
            "lr_scale_frcn": 0.1,
            "lr_scale_text_bert": 0.1,
            "lr_scale_mmt": 1.0,
            "text_bert_init_from_bert_base": False,
            "text_bert": {
                "vocab_size": 100,
                "hidden_size": 768,  # the projection input is hardcoded 768
                "num_hidden_layers": 1,
                "num_attention_heads": 12,
                "intermediate_size": 64,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            },
            "obj": {"mmt_in_dim": FC7_OUT, "dropout_prob": 0.0},
            "ocr": {
                "mmt_in_dim": 300 + 604 + FC7_OUT + ORDER_DIM,
                "dropout_prob": 0.0,
            },
            "mmt": {
                "hidden_size": MMT_H,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "intermediate_size": 64,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            },
            "classifier": {
                "type": "linear",
                "ocr_max_num": OCR_MAX_NUM,
                "ocr_ptr_net": {"hidden_size": MMT_H, "query_key_size": MMT_H},
                "params": {},
            },
        }
    )
    torch.manual_seed(5)
    model = ref_m4c_mod.M4C(config)
    model.build()
    yield model
    shims.uninstall()


def _batch(numpy=True):
    rng = np.random.RandomState(8)
    b = {
        "text": rng.randint(0, 100, (B, T_TXT)),
        "text_len": np.array([T_TXT, T_TXT - 2]),
        "image_feature_0": rng.randn(B, N_OBJ, 2048).astype(np.float32),
        "obj_bbox_coordinates": rng.rand(B, N_OBJ, 4).astype(np.float32),
        "ocr_bbox_coordinates": rng.rand(B, N_OCR, 4).astype(np.float32),
        "image_info_0": {"max_features": np.array([N_OBJ, N_OBJ - 1])},
        "context_feature_0": rng.randn(B, N_OCR, 300).astype(np.float32),
        "context_feature_1": rng.randn(B, N_OCR, 604).astype(np.float32),
        "image_feature_1": rng.randn(B, N_OCR, 2048).astype(np.float32),
        "order_vectors": np.zeros((B, N_OCR, ORDER_DIM), np.float32),
        "context_info_0": {"max_features": np.array([N_OCR, N_OCR - 1])},
        "train_prev_inds": rng.randint(0, 10 + N_OCR, (B, T_DEC)),
    }
    return b


def _ref_forward(model, batch, training):
    import torch
    from mmf.common.sample import Sample, SampleList

    s = Sample()
    for k, v in batch.items():
        if isinstance(v, dict):
            sub = Sample()
            for k2, v2 in v.items():
                setattr(sub, k2, torch.from_numpy(np.asarray(v2)))
            setattr(s, k, sub)
        else:
            setattr(s, k, torch.from_numpy(np.asarray(v)))
    sl = SampleList([s])
    # SampleList([one sample]) adds a batch dim; our arrays are already
    # batched, so rebuild fields directly instead
    for k, v in batch.items():
        if isinstance(v, dict):
            sub = SampleList()
            for k2, v2 in v.items():
                sub[k2] = torch.from_numpy(np.asarray(v2))
            sl[k] = sub
        else:
            sl[k] = torch.from_numpy(np.asarray(v))
    model.train(training)
    with torch.no_grad():
        return model(sl)["scores"].numpy()


def _our_model_and_params(ref_model):
    import jax

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega

    registry.register("config", omega.create({"datasets": "textvqa",
                                              "training": {}}))
    registry.register("textvqa_num_final_outputs", NUM_FINAL)
    mc = omega.create(
        {
            "text_bert": {
                "vocab_size": 100, "hidden_size": 768,
                "num_hidden_layers": 1, "num_attention_heads": 12,
                "intermediate_size": 64,
                "hidden_dropout_prob": 0.0,
                "attention_probs_dropout_prob": 0.0,
            },
            "obj": {"mmt_in_dim": FC7_OUT, "dropout_prob": 0.0},
            "ocr": {"mmt_in_dim": 300 + 604 + FC7_OUT + ORDER_DIM,
                    "dropout_prob": 0.0},
            "mmt": {"hidden_size": MMT_H, "num_hidden_layers": 2,
                    "num_attention_heads": 4, "intermediate_size": 64,
                    "hidden_dropout_prob": 0.0,
                    "attention_probs_dropout_prob": 0.0},
            "classifier": {
                "type": "linear", "ocr_max_num": OCR_MAX_NUM,
                "ocr_ptr_net": {"hidden_size": MMT_H,
                                "query_key_size": MMT_H},
                "params": {},
            },
            "bos_idx": 1,
            "decode_unroll": 2,
        }
    )
    jmodel = registry.get_model_class("m4c")(config=mc)
    batch = _batch()
    variables = jmodel.init(jax.random.PRNGKey(0), batch, False)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    # classifier weights double as the fixed answer embeddings — same
    # [num_choices, hidden] layout on both sides, no transpose
    cls_w = sd.pop("classifier.module.weight")
    cls_b = sd.pop("classifier.module.bias")
    converted, stats = convert_torch_state_dict(
        sd, variables["params"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    assert stats["missed"] == 0, stats
    converted["classifier_w"] = cls_w
    converted["classifier_b"] = cls_b
    return jmodel, {"params": converted}, batch


def test_m4c_full_train_forward_parity(ref_m4c):
    t_scores = _ref_forward(ref_m4c, _batch(), training=True)
    jmodel, variables, batch = _our_model_and_params(ref_m4c)
    import jax
    j_scores = np.asarray(jmodel.apply(
        variables, batch, True, rngs={"dropout": jax.random.PRNGKey(1)}
    )["scores"])
    assert j_scores.shape == t_scores.shape == (B, T_DEC, 10 + N_OCR)
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)


def test_m4c_full_eval_decode_parity(ref_m4c):
    """The whole greedy chain must match: any score divergence that flips
    an argmax would cascade through the feedback indices."""
    t_scores = _ref_forward(ref_m4c, _batch(), training=False)
    jmodel, variables, batch = _our_model_and_params(ref_m4c)
    j_scores = np.asarray(jmodel.apply(variables, batch, False)["scores"])
    assert j_scores.shape == t_scores.shape
    np.testing.assert_allclose(j_scores, t_scores, atol=ATOL)
