"""Golden-logit parity against the actual PyTorch reference at
/root/reference (the BASELINE.json north star: converted weights must
reproduce reference outputs within fp32 tolerance).

The reference imports through tests.reference_parity.shims (only for
modules genuinely absent from this image); shims are installed by a
module fixture and removed afterwards so gated-import behavior elsewhere
is unaffected."""

import os

import numpy as np
import pytest

from mmf_tpu.utils.checkpoint_updater import (
    HF_BERT_KEY_MAP,
    convert_torch_state_dict,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/mmf"),
    reason="reference checkout not mounted",
)

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref():
    from tests.reference_parity import shims

    shims.install()
    import mmf.models.m4c as ref_m4c
    import mmf.models.mmbt as ref_mmbt
    import mmf.models.vilbert as ref_vilbert
    import mmf.models.visual_bert as ref_visual_bert

    yield {
        "m4c": ref_m4c,
        "mmbt": ref_mmbt,
        "vilbert": ref_vilbert,
        "visual_bert": ref_visual_bert,
    }
    shims.uninstall()


def _state_dict_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_visual_bert_base_full_visual_parity(ref):
    """Reference VisualBERTBase (text + projected visual spans) vs our
    trunk with converted weights — the full fusion path, not just text."""
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.models.visual_bert import VisualBertBase
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(0)
    bert_config = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tmodel = ref["visual_bert"].VisualBERTBase(
        bert_config, visual_embedding_dim=8
    ).eval()

    cfg = TransformerConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = VisualBertBase(cfg, visual_embedding_dim=8)

    B, S, R = 2, 6, 4
    rng = np.random.RandomState(0)
    input_ids = rng.randint(0, 120, (B, S))
    token_type_ids = np.zeros((B, S), np.int64)
    visual = rng.randn(B, R, 8).astype(np.float32)
    visual_type = np.ones((B, R), np.int64)
    # mixed mask: pad the last text token and last region of sample 1
    mask = np.ones((B, S + R), np.float32)
    mask[1, S - 1] = 0
    mask[1, -1] = 0

    with torch.no_grad():
        t_seq, t_pooled, _ = tmodel(
            torch.from_numpy(input_ids),
            torch.from_numpy(mask),
            torch.from_numpy(token_type_ids),
            torch.from_numpy(visual),
            torch.from_numpy(visual_type),
        )

    params = jmodel.init(
        jax.random.PRNGKey(0), input_ids, mask, token_type_ids, visual,
        visual_type,
    )
    converted, stats = convert_torch_state_dict(
        _state_dict_np(tmodel), params["params"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0
    assert stats["matched"] == 43  # 9 emb + 16x2 layers + 2 pooler

    j_seq, j_pooled = jmodel.apply(
        {"params": converted}, input_ids, mask, token_type_ids, visual, visual_type
    )
    np.testing.assert_allclose(np.asarray(j_seq), t_seq.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_pooled), t_pooled.numpy(),
                               atol=ATOL)


VILBERT_CONNECTION_KEY_MAP = {
    r"^biattention\.": "",
    r"^biOutput\.dense1": "biout_dense1",
    r"^biOutput\.LayerNorm1": "biout_ln1",
    r"^biOutput\.dense2": "biout_dense2",
    r"^biOutput\.LayerNorm2": "biout_ln2",
    r"^v_intermediate\.dense": "v_intermediate",
    r"^v_output\.dense": "v_output",
    r"^v_output\.LayerNorm": "v_output_ln",
    r"^t_intermediate\.dense": "t_intermediate",
    r"^t_output\.dense": "t_output",
    r"^t_output\.LayerNorm": "t_output_ln",
}


def test_vilbert_connection_layer_parity(ref):
    """Reference BertConnectionLayer (bi-attention bridge + per-stream
    FFNs) vs our ConnectionLayer with converted weights."""
    import jax
    import torch
    from types import SimpleNamespace

    from mmf_tpu.models.vilbert import ConnectionLayer

    torch.manual_seed(1)
    config = SimpleNamespace(
        bi_hidden_size=24, bi_num_attention_heads=4,
        v_hidden_size=20, hidden_size=16,
        v_attention_probs_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, hidden_dropout_prob=0.0,
        v_intermediate_size=40, intermediate_size=32,
        v_hidden_act="gelu", hidden_act="gelu", visualization=False,
        layer_norm_eps=1e-12,
    )
    tlayer = ref["vilbert"].BertConnectionLayer(config).eval()

    our_cfg = {
        "bi_hidden_size": 24, "bi_num_attention_heads": 4,
        "v_hidden_size": 20, "hidden_size": 16,
        "v_intermediate_size": 40, "intermediate_size": 32,
        "v_hidden_act": "gelu", "hidden_act": "gelu",
        "v_hidden_dropout_prob": 0.0, "hidden_dropout_prob": 0.0,
    }
    jlayer = ConnectionLayer(our_cfg)

    B, TV, TT = 2, 5, 7
    rng = np.random.RandomState(1)
    v_hidden = rng.randn(B, TV, 20).astype(np.float32)
    t_hidden = rng.randn(B, TT, 16).astype(np.float32)
    # additive extended masks; pad the tail of each stream in sample 0
    v_mask = np.zeros((B, 1, 1, TV), np.float32)
    t_mask = np.zeros((B, 1, 1, TT), np.float32)
    v_mask[0, ..., -1] = -10000.0
    t_mask[0, ..., -2:] = -10000.0

    with torch.no_grad():
        t_v, t_t, _ = tlayer(
            torch.from_numpy(v_hidden), torch.from_numpy(v_mask),
            torch.from_numpy(t_hidden), torch.from_numpy(t_mask),
        )

    params = jlayer.init(
        jax.random.PRNGKey(0), v_hidden, v_mask, t_hidden, t_mask
    )
    converted, stats = convert_torch_state_dict(
        _state_dict_np(tlayer), params["params"], key_map=VILBERT_CONNECTION_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0
    # q_dense1/q_dense2 exist in the reference but are unused in forward
    assert stats["matched"] >= 32

    j_v, j_t = jlayer.apply({"params": converted}, v_hidden, v_mask, t_hidden, t_mask)
    np.testing.assert_allclose(np.asarray(j_v), t_v.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_t), t_t.numpy(), atol=ATOL)


def test_m4c_mmt_prefix_lm_parity(ref):
    """Reference MMT (joint transformer with prefix-LM causal decode span,
    incl. PrevPredEmbeddings answer/OCR gather) vs ours."""
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.models.m4c import MMT
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(2)
    H = 32
    bert_config = BertConfig(
        vocab_size=30, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tmodel = ref["m4c"].MMT(bert_config).eval()

    cfg = TransformerConfig(
        vocab_size=30, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = MMT(cfg)

    B, T_TXT, T_OBJ, T_OCR, T_DEC, N_ANS = 2, 5, 4, 3, 6, 11
    rng = np.random.RandomState(2)
    txt_emb = rng.randn(B, T_TXT, H).astype(np.float32)
    obj_emb = rng.randn(B, T_OBJ, H).astype(np.float32)
    ocr_emb = rng.randn(B, T_OCR, H).astype(np.float32)
    fixed_ans_emb = rng.randn(N_ANS, H).astype(np.float32)
    prev_inds = rng.randint(0, N_ANS + T_OCR, (B, T_DEC))
    txt_mask = np.ones((B, T_TXT), np.float32)
    txt_mask[1, -1] = 0
    obj_mask = np.ones((B, T_OBJ), np.float32)
    ocr_mask = np.ones((B, T_OCR), np.float32)
    ocr_mask[0, -1] = 0

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(txt_emb), torch.from_numpy(txt_mask),
            torch.from_numpy(obj_emb), torch.from_numpy(obj_mask),
            torch.from_numpy(ocr_emb), torch.from_numpy(ocr_mask),
            torch.from_numpy(fixed_ans_emb),
            torch.from_numpy(prev_inds),
        )

    params = jmodel.init(
        jax.random.PRNGKey(0), txt_emb, txt_mask, obj_emb, obj_mask,
        ocr_emb, ocr_mask, fixed_ans_emb, prev_inds,
    )
    converted, stats = convert_torch_state_dict(
        _state_dict_np(tmodel), params["params"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0

    j_out = jmodel.apply(
        {"params": converted}, txt_emb, txt_mask, obj_emb, obj_mask, ocr_emb,
        ocr_mask, fixed_ans_emb, prev_inds,
    )
    for key in ("mmt_seq_output", "mmt_txt_output", "mmt_ocr_output",
                "mmt_dec_output"):
        np.testing.assert_allclose(
            np.asarray(j_out[key]), t_out[key].numpy(), atol=ATOL,
            err_msg=key,
        )


def test_m4c_ocr_ptr_net_parity(ref):
    """Reference OcrPtrNet (dynamic copy scores) vs ours."""
    import jax
    import torch

    from mmf_tpu.models.m4c import OcrPtrNet

    torch.manual_seed(3)
    H = 16
    tnet = ref["m4c"].OcrPtrNet(hidden_size=H).eval()
    jnet = OcrPtrNet(hidden_size=H)

    B, T_DEC, T_OCR = 2, 5, 4
    rng = np.random.RandomState(3)
    query = rng.randn(B, T_DEC, H).astype(np.float32)
    keys = rng.randn(B, T_OCR, H).astype(np.float32)
    mask = np.ones((B, T_OCR), np.float32)
    mask[1, -2:] = 0

    with torch.no_grad():
        t_scores = tnet(torch.from_numpy(query), torch.from_numpy(keys),
                        torch.from_numpy(mask))

    params = jnet.init(jax.random.PRNGKey(0), query, keys, mask)
    converted, stats = convert_torch_state_dict(
        _state_dict_np(tnet), params["params"]
    )
    assert stats["matched"] == 4 and stats["shape_mismatch"] == 0

    j_scores = jnet.apply({"params": converted}, query, keys, mask)
    np.testing.assert_allclose(np.asarray(j_scores), t_scores.numpy(),
                               atol=ATOL)


VILBERT_TRUNK_KEY_MAP = {
    r"^encoder\.layer\.(\d+)\.attention\.self\.": r"layer_\1.",
    r"^encoder\.layer\.(\d+)\.attention\.output\.dense":
        r"layer_\1.attention_output_dense",
    r"^encoder\.layer\.(\d+)\.attention\.output\.LayerNorm":
        r"layer_\1.attention_ln",
    r"^encoder\.layer\.(\d+)\.intermediate\.dense":
        r"layer_\1.intermediate_dense",
    r"^encoder\.layer\.(\d+)\.output\.dense": r"layer_\1.output_dense",
    r"^encoder\.layer\.(\d+)\.output\.LayerNorm": r"layer_\1.output_ln",
    r"^encoder\.v_layer\.(\d+)\.attention\.self\.":
        r"v_layer_\1.attention_self.",
    r"^encoder\.v_layer\.(\d+)\.attention\.output\.dense":
        r"v_layer_\1.attention_output_dense",
    r"^encoder\.v_layer\.(\d+)\.attention\.output\.LayerNorm":
        r"v_layer_\1.attention_ln",
    r"^encoder\.v_layer\.(\d+)\.intermediate\.dense":
        r"v_layer_\1.intermediate_dense",
    r"^encoder\.v_layer\.(\d+)\.output\.dense": r"v_layer_\1.output_dense",
    r"^encoder\.v_layer\.(\d+)\.output\.LayerNorm": r"v_layer_\1.output_ln",
    r"^encoder\.c_layer\.(\d+)\.biattention\.": r"c_layer_\1.",
    r"^encoder\.c_layer\.(\d+)\.biOutput\.dense1": r"c_layer_\1.biout_dense1",
    r"^encoder\.c_layer\.(\d+)\.biOutput\.LayerNorm1":
        r"c_layer_\1.biout_ln1",
    r"^encoder\.c_layer\.(\d+)\.biOutput\.dense2": r"c_layer_\1.biout_dense2",
    r"^encoder\.c_layer\.(\d+)\.biOutput\.LayerNorm2":
        r"c_layer_\1.biout_ln2",
    r"^encoder\.c_layer\.(\d+)\.v_intermediate\.dense":
        r"c_layer_\1.v_intermediate",
    r"^encoder\.c_layer\.(\d+)\.v_output\.dense": r"c_layer_\1.v_output",
    r"^encoder\.c_layer\.(\d+)\.v_output\.LayerNorm":
        r"c_layer_\1.v_output_ln",
    r"^encoder\.c_layer\.(\d+)\.t_intermediate\.dense":
        r"c_layer_\1.t_intermediate",
    r"^encoder\.c_layer\.(\d+)\.t_output\.dense": r"c_layer_\1.t_output",
    r"^encoder\.c_layer\.(\d+)\.t_output\.LayerNorm":
        r"c_layer_\1.t_output_ln",
    r"^v_embeddings\.image_embeddings": "v_image_embeddings",
    r"^v_embeddings\.image_location_embeddings": "v_location_embeddings",
    r"^v_embeddings\.LayerNorm": "v_embeddings_ln",
    r"^embeddings\.LayerNorm": "embeddings.layer_norm",
    r"^t_pooler\.dense": "t_pooler",
    r"^v_pooler\.dense": "v_pooler",
}


def _tiny_vilbert(ref):
    """Shared tiny ViLBERTBase on both sides, weights converted
    torch -> flax. Returns (tmodel, jmodel, converted_params, inputs)."""
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.models.vilbert import ViLBertBase

    # the reference's replace_with_jit() patches the *installed* HF
    # transformers internals, which have changed; ViLBERT defines its own
    # layer classes, so the patch is irrelevant to these numerics
    ref["vilbert"].replace_with_jit = lambda *a, **k: None

    torch.manual_seed(4)
    H, VH, BI = 16, 20, 24
    common = dict(
        vocab_size=80, hidden_size=H, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=32,
        max_position_embeddings=30, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bert_config = BertConfig(**common)
    for k, v in dict(
        v_feature_size=12, v_hidden_size=VH, v_num_hidden_layers=3,
        v_num_attention_heads=4, v_intermediate_size=40,
        v_attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
        v_hidden_act="gelu", bi_hidden_size=BI, bi_num_attention_heads=4,
        v_biattention_id=[1, 2], t_biattention_id=[2, 3],
        fixed_t_layer=0, fixed_v_layer=0, fast_mode=False,
        with_coattention=True, dynamic_attention=False,
        in_batch_pairs=False, visualization=False,
        task_specific_tokens=False, visual_target=0,
    ).items():
        setattr(bert_config, k, v)
    tmodel = ref["vilbert"].ViLBERTBase(bert_config).eval()

    our_cfg = dict(common)
    our_cfg.update(
        v_feature_size=12, v_hidden_size=VH, v_num_hidden_layers=3,
        v_num_attention_heads=4, v_intermediate_size=40,
        v_hidden_act="gelu", bi_hidden_size=BI, bi_num_attention_heads=4,
        v_biattention_id=[1, 2], t_biattention_id=[2, 3],
        fixed_t_layer=0, fixed_v_layer=0, with_coattention=True,
        v_hidden_dropout_prob=0.0,
    )
    jmodel = ViLBertBase(our_cfg)

    B, S, R = 2, 7, 5
    rng = np.random.RandomState(4)
    input_ids = rng.randint(0, 80, (B, S))
    image_feature = rng.randn(B, R, 12).astype(np.float32)
    image_location = rng.rand(B, R, 5).astype(np.float32)
    token_type_ids = np.zeros((B, S), np.int64)
    attention_mask = np.ones((B, S), np.float32)
    attention_mask[1, -2:] = 0
    image_attention_mask = np.ones((B, R), np.float32)
    image_attention_mask[0, -1] = 0

    inputs = {
        "input_ids": input_ids,
        "image_feature": image_feature,
        "image_location": image_location,
        "token_type_ids": token_type_ids,
        "attention_mask": attention_mask,
        "image_attention_mask": image_attention_mask,
    }
    params = jmodel.init(
        jax.random.PRNGKey(0), input_ids, image_feature, image_location,
        token_type_ids, attention_mask, image_attention_mask,
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=VILBERT_TRUNK_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    return tmodel, jmodel, converted, stats, inputs


_VILBERT_INPUT_ORDER = (
    "input_ids", "image_feature", "image_location", "token_type_ids",
    "attention_mask", "image_attention_mask",
)


def test_vilbert_full_trunk_parity(ref):
    """Reference ViLBERTBase end-to-end: embeddings, interleaved two-stream
    encoder with the co-attention schedule, ReLU poolers."""
    import torch

    tmodel, jmodel, converted, _, inputs = _tiny_vilbert(ref)

    with torch.no_grad():
        t_out = tmodel(
            *(torch.from_numpy(inputs[k]) for k in _VILBERT_INPUT_ORDER)
        )
    t_seq_t, t_seq_v, t_pooled_t, t_pooled_v = t_out[:4]

    j_txt, j_img, j_pooled_t, j_pooled_v = jmodel.apply(
        {"params": converted},
        *(inputs[k] for k in _VILBERT_INPUT_ORDER),
    )
    np.testing.assert_allclose(np.asarray(j_txt), t_seq_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_img), t_seq_v.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_pooled_t), t_pooled_t.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_pooled_v), t_pooled_v.numpy(),
                               atol=ATOL)


def test_vilbert_gradient_parity(ref):
    """torch loss.backward() vs jax.grad through the full two-stream
    trunk — the interleaved co-attention (BertBiAttention,
    reference vilbert.py:347-475) backward is the riskiest path — under
    the reference classification head's 'mul' fusion
    (pooled_t * pooled_v -> classifier, vilbert.py:1319-1322) + logit_bce."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from mmf_tpu.modules.losses import LogitBinaryCrossEntropy
    from tests.reference_parity.grad_utils import (
        assert_grad_trees_match,
        grad_dict_np,
    )

    tmodel, jmodel, converted, wstats, inputs = _tiny_vilbert(ref)

    BI, N_LABELS = 24, 3
    torch.manual_seed(44)
    tcls = torch.nn.Linear(BI, N_LABELS)
    rng = np.random.RandomState(44)
    targets = rng.randint(0, 2, (2, N_LABELS)).astype(np.float32)

    t_out = tmodel(
        *(torch.from_numpy(inputs[k]) for k in _VILBERT_INPUT_ORDER)
    )
    t_pooled_t, t_pooled_v = t_out[2], t_out[3]
    t_scores = tcls(t_pooled_t * t_pooled_v)
    # reference losses.py:225 LogitBinaryCrossEntropy
    t_loss = F.binary_cross_entropy_with_logits(
        t_scores, torch.from_numpy(targets), reduction="mean"
    ) * N_LABELS
    t_loss.backward()

    jcls = {
        "kernel": tcls.weight.detach().numpy().T.copy(),
        "bias": tcls.bias.detach().numpy().copy(),
    }

    def jax_loss(trunk_params, cls_params):
        _, _, pooled_t, pooled_v = jmodel.apply(
            {"params": trunk_params},
            *(inputs[k] for k in _VILBERT_INPUT_ORDER),
        )
        scores = (pooled_t * pooled_v) @ cls_params["kernel"] \
            + cls_params["bias"]
        return LogitBinaryCrossEntropy()(
            {"targets": jnp.asarray(targets)}, {"scores": scores}
        )

    j_loss, (g_trunk, g_cls) = jax.value_and_grad(
        jax_loss, argnums=(0, 1)
    )(converted, jcls)
    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-5
    )

    # convert the torch grad dict through the SAME map as the weights —
    # conversion is pure rename+transpose, hence valid for grads
    g_converted, gstats = convert_torch_state_dict(
        grad_dict_np(tmodel), g_trunk, key_map=VILBERT_TRUNK_KEY_MAP
    )
    assert gstats["matched"] == wstats["matched"]
    assert gstats["shape_mismatch"] == 0
    assert_grad_trees_match(g_trunk, g_converted, min_leaves=100)

    np.testing.assert_allclose(
        np.asarray(g_cls["kernel"]), tcls.weight.grad.numpy().T,
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(g_cls["bias"]), tcls.bias.grad.numpy(),
        rtol=1e-4, atol=1e-7,
    )


MMBT_KEY_MAP = {
    r"^transformer\.embeddings\.word_embeddings": "word_embeddings",
    r"^transformer\.embeddings\.position_embeddings": "position_embeddings",
    r"^transformer\.embeddings\.token_type_embeddings":
        "token_type_embeddings",
    r"^transformer\.embeddings\.LayerNorm": "embeddings_layer_norm",
    r"^transformer\.encoder\.layer\.(\d+)\.attention\.self\.query":
        r"encoder.layer_\1.attention.query",
    r"^transformer\.encoder\.layer\.(\d+)\.attention\.self\.key":
        r"encoder.layer_\1.attention.key",
    r"^transformer\.encoder\.layer\.(\d+)\.attention\.self\.value":
        r"encoder.layer_\1.attention.value",
    r"^transformer\.encoder\.layer\.(\d+)\.attention\.output\.dense":
        r"encoder.layer_\1.attention.output_dense",
    r"^transformer\.encoder\.layer\.(\d+)\.attention\.output\.LayerNorm":
        r"encoder.layer_\1.attention.output_layer_norm",
    r"^transformer\.encoder\.layer\.(\d+)\.intermediate\.dense":
        r"encoder.layer_\1.ffn.intermediate_dense",
    r"^transformer\.encoder\.layer\.(\d+)\.output\.dense":
        r"encoder.layer_\1.ffn.output_dense",
    r"^transformer\.encoder\.layer\.(\d+)\.output\.LayerNorm":
        r"encoder.layer_\1.ffn.output_layer_norm",
    r"^transformer\.pooler\.dense": "pooler.dense",
    r"^modal_encoder\.proj_embeddings": "proj_embeddings",
    # modal_encoder re-exposes the shared embedding tables; map the
    # duplicates onto the same flax leaves (values are identical)
    r"^modal_encoder\.word_embeddings": "word_embeddings",
    r"^modal_encoder\.position_embeddings": "position_embeddings",
    r"^modal_encoder\.token_type_embeddings": "token_type_embeddings",
    r"^modal_encoder\.LayerNorm": "embeddings_layer_norm",
}


def _tiny_mmbt(ref):
    """Shared tiny MMBTModel (real HF BertModel + identity modal encoder)
    on both sides, weights converted torch -> flax. Returns
    (tmodel, jmodel, converted_params, stats, inputs)."""
    import jax
    import torch
    from transformers import BertConfig, BertModel

    from mmf_tpu.models.mmbt import MMBTTrunk
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(5)
    H = 24
    bert_config = BertConfig(
        vocab_size=90, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    bert_config.modal_hidden_size = 10
    transformer = BertModel(bert_config)
    tmodel = ref["mmbt"].MMBTModel(
        bert_config, transformer, torch.nn.Identity()
    ).eval()

    cfg = TransformerConfig(
        vocab_size=90, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = MMBTTrunk(cfg, modal_hidden_size=10)

    B, M, S = 2, 3, 6
    rng = np.random.RandomState(5)
    input_modal = rng.randn(B, M, 10).astype(np.float32)
    input_ids = rng.randint(0, 90, (B, S))
    start_tok = np.full((B,), 3, np.int64)
    end_tok = np.full((B,), 4, np.int64)
    attention_mask = np.ones((B, S), np.float32)
    attention_mask[1, -1] = 0
    # text span is segment 1 in MMBT; modal span segment 0
    token_type_ids = np.ones((B, S), np.int64)
    modal_token_type = np.zeros((B, 1), np.int64)

    inputs = {
        "input_modal": input_modal,
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "token_type_ids": token_type_ids,
        "modal_token_type": modal_token_type,
        "start_tok": start_tok,
        "end_tok": end_tok,
    }
    params = jmodel.init(
        jax.random.PRNGKey(0), input_modal, input_ids, attention_mask,
        token_type_ids, modal_token_type, start_tok, end_tok,
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=MMBT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    return tmodel, jmodel, converted, stats, inputs


_MMBT_INPUT_ORDER = (
    "input_modal", "input_ids", "attention_mask", "token_type_ids",
    "modal_token_type", "start_tok", "end_tok",
)


def _mmbt_torch_forward(tmodel, inputs, no_grad=True):
    import torch

    ctx = torch.no_grad() if no_grad else _nullcontext()
    with ctx:
        return tmodel(
            torch.from_numpy(inputs["input_modal"]),
            torch.from_numpy(inputs["input_ids"]),
            modal_start_tokens=torch.from_numpy(inputs["start_tok"]),
            modal_end_tokens=torch.from_numpy(inputs["end_tok"]),
            attention_mask=torch.from_numpy(inputs["attention_mask"]),
            token_type_ids=torch.from_numpy(inputs["token_type_ids"]),
        )[:2]


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def test_mmbt_trunk_parity(ref):
    """Reference MMBTModel over a real HF BertModel with an identity modal
    encoder (direct features) vs our MMBTTrunk with converted weights."""
    tmodel, jmodel, converted, _, inputs = _tiny_mmbt(ref)
    M = inputs["input_modal"].shape[1]

    t_seq, t_pooled = _mmbt_torch_forward(tmodel, inputs)

    j_seq, j_pooled, m_len = jmodel.apply(
        {"params": converted}, *(inputs[k] for k in _MMBT_INPUT_ORDER)
    )
    assert m_len == M + 2  # start + features + end
    np.testing.assert_allclose(np.asarray(j_seq), t_seq.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_pooled), t_pooled.numpy(),
                               atol=ATOL)


def test_mmbt_gradient_parity(ref):
    """torch loss.backward() vs jax.grad through the MMBT trunk (shared
    token tables used by BOTH the modal and text spans — torch accumulates
    through the shared Parameter, flax through the shared leaf) under the
    hateful-memes head: Linear(pooled) -> cross_entropy
    (reference mmbt.py:447-565 classification path)."""
    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from tests.reference_parity.grad_utils import (
        assert_grad_trees_match,
        grad_dict_np,
    )

    tmodel, jmodel, converted, wstats, inputs = _tiny_mmbt(ref)

    H, N_LABELS = 24, 2
    torch.manual_seed(45)
    tcls = torch.nn.Linear(H, N_LABELS)
    targets = np.array([1, 0], np.int64)

    _, t_pooled = _mmbt_torch_forward(tmodel, inputs, no_grad=False)
    t_scores = tcls(t_pooled)
    # reference losses.py:595 CrossEntropyLoss (mean over batch)
    t_loss = F.cross_entropy(t_scores, torch.from_numpy(targets))
    t_loss.backward()

    jcls = {
        "kernel": tcls.weight.detach().numpy().T.copy(),
        "bias": tcls.bias.detach().numpy().copy(),
    }

    def jax_loss(trunk_params, cls_params):
        _, pooled, _ = jmodel.apply(
            {"params": trunk_params},
            *(inputs[k] for k in _MMBT_INPUT_ORDER),
        )
        scores = pooled @ cls_params["kernel"] + cls_params["bias"]
        logprobs = jax.nn.log_softmax(scores, axis=-1)
        picked = jnp.take_along_axis(
            logprobs, jnp.asarray(targets)[:, None], axis=-1
        )
        return -picked.mean()

    j_loss, (g_trunk, g_cls) = jax.value_and_grad(
        jax_loss, argnums=(0, 1)
    )(converted, jcls)
    np.testing.assert_allclose(
        float(j_loss), float(t_loss.detach()), rtol=1e-5
    )

    g_converted, gstats = convert_torch_state_dict(
        grad_dict_np(tmodel), g_trunk, key_map=MMBT_KEY_MAP
    )
    assert gstats["shape_mismatch"] == 0
    assert_grad_trees_match(g_trunk, g_converted, min_leaves=35)

    np.testing.assert_allclose(
        np.asarray(g_cls["kernel"]), tcls.weight.grad.numpy().T,
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(g_cls["bias"]), tcls.bias.grad.numpy(),
        rtol=1e-4, atol=1e-7,
    )


def test_vit_pre_ln_parity(ref):
    """Our pre-LN ViT (used by ViLT and the vit encoder) vs a
    locally-constructed HF ViTModel — the reference's ViT wrapper is a thin
    layer over exactly this HF module (mmf/modules/vit.py)."""
    import jax
    import torch
    from transformers import ViTConfig, ViTModel as HFViTModel

    from mmf_tpu.modules.vit import ViTModel
    from mmf_tpu.utils.checkpoint_updater import HF_VIT_KEY_MAP

    torch.manual_seed(6)
    H = 24
    hf_config = ViTConfig(
        hidden_size=H, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, image_size=32, patch_size=8, num_channels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12,
    )
    tmodel = HFViTModel(hf_config, add_pooling_layer=True).eval()

    jmodel = ViTModel(
        hidden_size=H, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, image_size=32, patch_size=8,
        layer_norm_eps=1e-12, hidden_dropout_prob=0.0,
    )

    B = 2
    rng = np.random.RandomState(6)
    pixel_values = rng.randn(B, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(pixel_values))
    t_seq = t_out.last_hidden_state.numpy()
    t_pooled = t_out.pooler_output.numpy()

    params = jmodel.init(jax.random.PRNGKey(0), pixel_values)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=HF_VIT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0, stats
    assert stats["missed"] == 0, stats

    j_seq, j_pooled = jmodel.apply({"params": converted}, pixel_values)
    np.testing.assert_allclose(np.asarray(j_seq), t_seq, atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_pooled), t_pooled, atol=ATOL)


def test_detr_sine_position_embedding_parity(ref):
    """Our closed-form sine grid encoding vs the reference's
    PositionEmbeddingSine with an all-valid mask (unit/backbone.py:91)."""
    import torch

    import mmf.models.unit.backbone as ref_backbone
    from mmf_tpu.models.unit.unit import sine_position_embedding

    hh, ww, hidden = 5, 7, 32
    tmod = ref_backbone.PositionEmbeddingSine(
        num_pos_feats=hidden // 2, normalize=True
    )

    class NT:
        tensors = torch.zeros(1, 3, hh, ww)
        mask = torch.zeros(1, hh, ww, dtype=torch.bool)

    with torch.no_grad():
        t_pos = tmod(NT())  # [1, hidden, hh, ww]
    t_flat = t_pos[0].permute(1, 2, 0).reshape(hh * ww, hidden).numpy()

    j_pos = np.asarray(sine_position_embedding(hh, ww, hidden))
    np.testing.assert_allclose(j_pos, t_flat, atol=1e-5)


def test_visual_bert_pretraining_mlm_parity(ref):
    """Reference VisualBERTForPretraining MLM logits + masked LM loss vs
    our pretraining path (trunk + cls head) with converted weights —
    validates zoo pretraining-checkpoint conversion end to end."""
    import jax
    import torch

    from mmf_tpu.config import omega
    from mmf_tpu.models.visual_bert import VisualBertBase
    from mmf_tpu.modules.transformer import MLMHead, TransformerConfig

    torch.manual_seed(13)
    cfg_dict = dict(
        vocab_size=60, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        visual_embedding_dim=8, embedding_strategy="plain",
        bypass_transformer=False, output_attentions=False,
        output_hidden_states=False, random_initialize=True,
    )
    tmodel = ref["visual_bert"].VisualBERTForPretraining(
        omega.create(cfg_dict)
    ).eval()

    cfg = TransformerConfig(
        vocab_size=60, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )

    import flax.linen as nn

    class PretrainSlice(nn.Module):
        @nn.compact
        def __call__(self, ids, mask, tt, vis, vt):
            seq, _ = VisualBertBase(cfg, visual_embedding_dim=8,
                                    name="bert")(ids, mask, tt, vis, vt)
            return MLMHead(cfg, name="cls")(seq)

    jmodel = PretrainSlice()

    B, S, R = 2, 6, 3
    rng = np.random.RandomState(13)
    input_ids = rng.randint(0, 60, (B, S))
    token_type_ids = np.zeros((B, S), np.int64)
    visual = rng.randn(B, R, 8).astype(np.float32)
    visual_type = np.zeros((B, R), np.int64)
    mask = np.ones((B, S + R), np.float32)
    labels = np.full((B, S + R), -1, np.int64)
    labels[0, 2] = 5
    labels[1, 4] = 7

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(input_ids),
            torch.from_numpy(mask[:, :S]),
            torch.from_numpy(mask),
            torch.from_numpy(token_type_ids),
            torch.from_numpy(visual),
            torch.from_numpy(visual_type),
            masked_lm_labels=torch.from_numpy(labels),
        )

    params = jmodel.init(
        jax.random.PRNGKey(0), input_ids, mask, token_type_ids, visual,
        visual_type,
    )
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # seq_relationship head is unused in MMF's pretraining loss; decoder
    # bias is duplicated as cls.predictions.bias
    sd = {k: v for k, v in sd.items()
          if not k.startswith("cls.seq_relationship")
          and k != "cls.predictions.bias"}
    # keep the bert. prefix (our tree nests the trunk under "bert")
    key_map = {k: v for k, v in HF_BERT_KEY_MAP.items() if k != r"^bert\."}
    key_map.update({
        r"^bert\.embeddings\.LayerNorm": "bert.embeddings.layer_norm",
        r"^cls\.predictions\.transform\.dense": "cls.transform.dense",
        r"^cls\.predictions\.transform\.LayerNorm": "cls.transform.layer_norm",
        r"^cls\.predictions\.decoder": "cls.decoder",
    })
    converted, stats = convert_torch_state_dict(
        sd, params["params"], key_map=key_map
    )
    assert stats["shape_mismatch"] == 0, stats
    assert stats["missed"] == 0, stats

    j_logits = jmodel.apply(
        {"params": converted}, input_ids, mask, token_type_ids, visual,
        visual_type,
    )
    np.testing.assert_allclose(np.asarray(j_logits), t_out["logits"].numpy(),
                               atol=ATOL)
    # the masked-LM loss formula too
    valid = labels != -1
    logprobs = np.asarray(
        jax.nn.log_softmax(np.asarray(j_logits, np.float64), axis=-1)
    )
    picked = np.take_along_axis(
        logprobs, np.where(valid, labels, 0)[..., None], axis=-1
    )[..., 0]
    j_loss = -(picked * valid).sum() / valid.sum()
    np.testing.assert_allclose(j_loss, float(t_out["masked_lm_loss"]),
                               atol=1e-5)


def test_visual_bert_int8_serving_tracks_reference(ref):
    """The int8 serving path (ops/quant.py) applied to CONVERTED reference
    weights: outputs must track the torch reference within 8-bit rounding
    (a serving-precision guarantee the reference itself cannot offer — it
    has no quantized path). Same setup as the full-visual parity test."""
    import jax
    import torch
    from transformers import BertConfig

    from mmf_tpu.models.visual_bert import VisualBertBase
    from mmf_tpu.modules.transformer import TransformerConfig

    torch.manual_seed(0)
    bert_config = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tmodel = ref["visual_bert"].VisualBERTBase(
        bert_config, visual_embedding_dim=8
    ).eval()

    kw = dict(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    jmodel = VisualBertBase(TransformerConfig(**kw), visual_embedding_dim=8)
    qmodel = VisualBertBase(
        TransformerConfig(quant="int8", **kw), visual_embedding_dim=8
    )

    B, S, R = 2, 6, 4
    rng = np.random.RandomState(0)
    input_ids = rng.randint(0, 120, (B, S))
    token_type_ids = np.zeros((B, S), np.int64)
    visual = rng.randn(B, R, 8).astype(np.float32)
    visual_type = np.ones((B, R), np.int64)
    mask = np.ones((B, S + R), np.float32)

    with torch.no_grad():
        t_seq, t_pooled, _ = tmodel(
            torch.from_numpy(input_ids),
            torch.from_numpy(mask),
            torch.from_numpy(token_type_ids),
            torch.from_numpy(visual),
            torch.from_numpy(visual_type),
        )

    params = jmodel.init(
        jax.random.PRNGKey(0), input_ids, mask, token_type_ids, visual,
        visual_type,
    )
    converted, stats = convert_torch_state_dict(
        _state_dict_np(tmodel), params["params"], key_map=HF_BERT_KEY_MAP
    )
    assert stats["shape_mismatch"] == 0

    args = (input_ids, mask, token_type_ids, visual, visual_type)
    f_seq, f_pooled = jmodel.apply({"params": converted}, *args)
    q_seq, q_pooled = qmodel.apply({"params": converted}, *args)
    # knob engages (int8 result differs bit-for-bit from the f32 one) ...
    assert not np.array_equal(np.asarray(q_seq), np.asarray(f_seq))
    # ... and stays within quantization noise of the torch reference
    t_seq, t_pooled = t_seq.numpy(), t_pooled.numpy()
    scale = np.abs(t_seq).max()
    assert np.abs(np.asarray(q_seq) - t_seq).max() < 0.05 * scale
    assert np.abs(np.asarray(q_pooled) - t_pooled).max() < 0.05
