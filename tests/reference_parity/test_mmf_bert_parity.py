"""Full-model MMFBert golden parity vs the torch reference
(mmf/models/mmf_bert.py:30-418) with converted weights at tiny dims:

- pretraining head: prediction scores over the joint (image-attended)
  sequence + seq_relationship score + in-model masked-LM loss;
- vqa head: 2nd-last-token gather from the joint stream -> transform ->
  answer logits (the reference hard-codes 3129 answers).

The reference composes raw ``nn.MultiheadAttention`` blocks (text
self-attention, image intra-attention, text->image cross-attention); the
packed ``in_proj_weight`` is split into thirds for our separate
q/k/v projections. ``BertConfig.from_pretrained`` is stubbed to a tiny
config so no network/pretrained weights are involved
(``pretrained_bert: false``).
"""

import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.utils.checkpoint_updater import _flatten_flax, _unflatten_flax
from mmf_tpu.utils.env import setup_imports

setup_imports()

ATOL = 2e-5
B, T, K = 2, 6, 3
H, HEADS, V, IMG_DIM = 8, 2, 30, 10
NUM_ANS = 3129  # reference mmf_bert.py:66 hard-codes the vqa space

MODEL_CFG = {
    "model_data_dir": "/tmp",
    "bert_model_name": "tiny-stub",
    "training_head_type": "pretraining",
    "combine_embeddings": True,
    "image_intra_attention": True,
    "pretrained_bert": False,
    "torchscript": False,
    "hidden_size": H,
    "num_attention_heads": HEADS,
    "vocab_size": V,
    "hidden_dropout_prob": 0.0,
    "attention_probs_dropout_prob": 0.0,
    "intermediate_size": 16,
    "max_position_embeddings": 24,
    "type_vocab_size": 2,
    "text_embeddings": [{"embed_dim": H, "num_heads": HEADS, "dropout": 0.0}],
    "image_feature_embeddings": [
        {"embed_dim": H, "num_heads": HEADS, "dropout": 0.0}
    ],
    "image_feature_attentions": [
        {"embed_dim": H, "num_heads": HEADS, "dropout": 0.0}
    ],
    "image_feature_dim": IMG_DIM,
    "image_feature_projection": {
        "module": "linear", "in_dim": IMG_DIM, "out_dim": H
    },
    "image_feature_encodings": [{"type": "default", "params": {}}],
    "image_text_modal_combine": {
        "type": "non_linear_element_multiply",
        "params": {"dropout": 0, "hidden_dim": H},
    },
}


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    from omegaconf import OmegaConf
    from mmf.common.registry import registry as ref_registry
    import mmf.models.mmf_bert as ref_mod

    real_cfg_cls = ref_mod.BertConfig

    class StubBertConfig:
        @staticmethod
        def from_pretrained(name):
            return real_cfg_cls(
                vocab_size=V, hidden_size=H, num_hidden_layers=1,
                num_attention_heads=HEADS, intermediate_size=16,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                max_position_embeddings=24, type_vocab_size=2,
            )

    ref_mod.BertConfig = StubBertConfig
    ref_registry.register(
        "config", OmegaConf.create({"model": "mmf_bert", "datasets": "vqa2"})
    )
    yield ref_mod
    ref_mod.BertConfig = real_cfg_cls
    shims.uninstall()


def _build_ref(ref, head):
    from omegaconf import OmegaConf

    m = ref.MMFBert(
        OmegaConf.create(dict(MODEL_CFG, training_head_type=head))
    )
    m.build()
    return m.eval()


def _batch():
    rng = np.random.RandomState(5)
    ids = rng.randint(0, V, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[1, 4:] = 0  # ragged batch: gather index differs per sample
    return {
        "input_ids": ids.astype(np.int64),
        "input_mask": mask,
        "segment_ids": rng.randint(0, 2, (B, T)).astype(np.int64),
        "image_feature_0": rng.randn(B, K, IMG_DIM).astype(np.float32),
    }


def _ref_sample_list(batch):
    import torch
    from mmf.common.sample import SampleList

    sl = SampleList()
    for k in ("input_ids", "input_mask", "segment_ids"):
        setattr(sl, k, torch.from_numpy(batch[k]))
    sl.image_feature_0 = torch.from_numpy(batch["image_feature_0"])
    sl.dataset_name = "vqa2"
    sl.dataset_type = "train"
    return sl


def _put_factory(flat, out):
    def put(path, value):
        key = tuple(path.split("/"))
        assert key in flat, f"no such flax param: {path}"
        assert flat[key].shape == np.shape(value), (
            f"{path}: {flat[key].shape} vs {np.shape(value)}"
        )
        out[key] = np.asarray(value, np.float32)

    return put


def _put_mha(put, sd, jprefix, tprefix):
    w = sd[f"{tprefix}.in_proj_weight"]
    b = sd[f"{tprefix}.in_proj_bias"]
    n = w.shape[0] // 3
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        put(f"{jprefix}/{name}/kernel",
            np.ascontiguousarray(w[i * n:(i + 1) * n].T))
        put(f"{jprefix}/{name}/bias", b[i * n:(i + 1) * n])
    put(f"{jprefix}/out_proj/kernel",
        np.ascontiguousarray(sd[f"{tprefix}.out_proj.weight"].T))
    put(f"{jprefix}/out_proj/bias", sd[f"{tprefix}.out_proj.bias"])


def _put_wn(flat, out, put, sd, jprefix, tprefix):
    # torch weight_norm(Linear, dim=None) -> flax WeightNorm(Dense):
    # the scale lives under a single compound leaf name
    g, v = sd[f"{tprefix}.weight_g"], sd[f"{tprefix}.weight_v"]
    put(f"{jprefix}/Dense_0/kernel", np.ascontiguousarray(v.T))
    put(f"{jprefix}/Dense_0/bias", sd[f"{tprefix}.bias"])
    p = tuple(jprefix.split("/"))
    hits = [k for k in flat if k[:len(p)] == p and k[-1].endswith("scale")]
    assert len(hits) == 1, f"scale leaf not found under {jprefix}: {hits}"
    out[hits[0]] = np.float32(g.reshape(()))


def _convert(sd, jparams, head):
    flat = dict(_flatten_flax(jparams))
    out = dict(flat)
    put = _put_factory(flat, out)

    we = "word_embedding"
    put(f"{we}/word_embeddings/embedding",
        sd["word_embedding.word_embeddings.weight"])
    put(f"{we}/position_embeddings/embedding",
        sd["word_embedding.position_embeddings.weight"])
    put(f"{we}/token_type_embeddings/embedding",
        sd["word_embedding.token_type_embeddings.weight"])
    put(f"{we}/layer_norm/scale", sd["word_embedding.LayerNorm.weight"])
    put(f"{we}/layer_norm/bias", sd["word_embedding.LayerNorm.bias"])

    _put_mha(put, sd, "text_embedding", "text_embedding")
    put("image_feature_projection/layers/kernel",
        np.ascontiguousarray(sd["image_feature_projection.layers.weight"].T))
    put("image_feature_projection/layers/bias",
        sd["image_feature_projection.layers.bias"])
    _put_mha(put, sd, "image_feature_intra_attention",
             "image_feature_intra_attention")
    _put_mha(put, sd, "image_feature_embeddings_0_0",
             "image_feature_embeddings_list.0.0")

    for arm in ("fa_image", "fa_txt"):
        _put_wn(
            flat, out, put, sd,
            f"image_text_multi_modal_combine_layer/module/{arm}",
            f"image_text_multi_modal_combine_layer.module.{arm}.layers.0",
        )

    put("pooler/dense/kernel",
        np.ascontiguousarray(sd["pooler.dense.weight"].T))
    put("pooler/dense/bias", sd["pooler.dense.bias"])

    if head == "pretraining":
        put("cls/transform/dense/kernel", np.ascontiguousarray(
            sd["classifier.predictions.transform.dense.weight"].T))
        put("cls/transform/dense/bias",
            sd["classifier.predictions.transform.dense.bias"])
        put("cls/transform/layer_norm/scale",
            sd["classifier.predictions.transform.LayerNorm.weight"])
        put("cls/transform/layer_norm/bias",
            sd["classifier.predictions.transform.LayerNorm.bias"])
        put("cls/decoder/kernel", np.ascontiguousarray(
            sd["classifier.predictions.decoder.weight"].T))
        put("cls/decoder/bias", sd["classifier.predictions.bias"])
        put("seq_relationship/kernel", np.ascontiguousarray(
            sd["classifier.seq_relationship.weight"].T))
        put("seq_relationship/bias", sd["classifier.seq_relationship.bias"])
    else:  # vqa: Sequential(transform, linear)
        put("classifier_transform/dense/kernel",
            np.ascontiguousarray(sd["classifier.0.dense.weight"].T))
        put("classifier_transform/dense/bias", sd["classifier.0.dense.bias"])
        put("classifier_transform/layer_norm/scale",
            sd["classifier.0.LayerNorm.weight"])
        put("classifier_transform/layer_norm/bias",
            sd["classifier.0.LayerNorm.bias"])
        put("classifier_logits/kernel",
            np.ascontiguousarray(sd["classifier.1.weight"].T))
        put("classifier_logits/bias", sd["classifier.1.bias"])

    return _unflatten_flax(out)


def _ours(batch, ref_model, head):
    import jax

    cfg = dict(MODEL_CFG, datasets="vqa2", training_head_type=head)
    model = registry.get_model_class("mmf_bert")(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = _convert(sd, variables["params"], head)
    return model.apply({"params": params}, batch, False)


def test_mmf_bert_pretraining_parity(ref):
    import torch

    torch.manual_seed(21)
    tm = _build_ref(ref, "pretraining")
    batch = _batch()
    lm = batch["input_ids"].copy()
    lm[:, ::2] = -1
    batch = dict(batch, lm_label_ids=lm)
    sl = _ref_sample_list(batch)
    sl.lm_label_ids = torch.from_numpy(lm)
    with torch.no_grad():
        t_out = tm(sl)
    j_out = _ours(batch, tm, "pretraining")
    np.testing.assert_allclose(
        np.asarray(j_out["logits"]), t_out["logits"].numpy(), atol=ATOL
    )
    t_loss = [v for k, v in t_out["losses"].items() if "masked_lm" in k]
    j_loss = [v for k, v in j_out["losses"].items() if "masked_lm" in k]
    assert len(t_loss) == 1 and len(j_loss) == 1
    np.testing.assert_allclose(
        float(j_loss[0]), float(t_loss[0]), atol=ATOL
    )


def test_mmf_bert_vqa_parity(ref):
    import torch

    torch.manual_seed(22)
    tm = _build_ref(ref, "vqa2")
    batch = _batch()
    sl = _ref_sample_list(batch)
    # the reference unconditionally reshapes lm_label_ids even on the vqa
    # path (mmf_bert.py:312-313 + utils/transform.py:7 crash on None)
    sl.lm_label_ids = torch.zeros((B, T), dtype=torch.long)
    with torch.no_grad():
        t_scores = tm(sl)["scores"].numpy()
    j_out = _ours(batch, tm, "vqa2")
    assert t_scores.shape == (B, NUM_ANS)
    np.testing.assert_allclose(
        np.asarray(j_out["scores"]), t_scores, atol=ATOL
    )
