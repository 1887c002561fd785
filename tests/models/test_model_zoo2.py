"""Smoke tests for the transformer long-tail: uniter, lxmert, vinvl,
cm_shared_transformer, mmf_bert, unit, krisp."""

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


def _vl_batch(T=6, R=4, fdim=32, with_bbox=True):
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 50, (B, T))),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "segment_ids": jnp.zeros((B, T), jnp.int32),
        "image_feature_0": jnp.asarray(rng.randn(B, R, fdim).astype(np.float32)),
        "dataset_name": "vqa2",
        "dataset_type": "train",
    }
    if with_bbox:
        batch["image_info_0"] = {
            "bbox": jnp.asarray(rng.rand(B, R, 4).astype(np.float32)),
            "max_features": jnp.asarray([R, R]),
        }
    return batch


SMALL = {"hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
         "intermediate_size": 64, "vocab_size": 50, "dtype": "float32"}


def test_uniter_classification():
    mc = omega.create(dict(SMALL, img_dim=32, do_pretraining=False,
                           tasks="vqa2",
                           heads={"vqa2": {"type": "mlp", "num_labels": 5,
                                           "hidden_size": 32}}))
    model = registry.get_model_class("uniter")(config=mc)
    batch = _vl_batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (B, 5)


def test_uniter_pretraining_tasks():
    for task in ["mlm", "itm", "mrfr", "wra"]:
        mc = omega.create(dict(
            SMALL, img_dim=32, do_pretraining=True, tasks=task,
            heads={task: {"type": task, "hidden_size": 32,
                          "vocab_size": 50}},
        ))
        model = registry.get_model_class("uniter")(config=mc)
        batch = _vl_batch()
        batch["task"] = task
        lm = np.full((B, 6), -1)
        lm[:, 2] = 7
        batch["lm_label_ids"] = jnp.asarray(lm)
        labels = np.zeros((B, 4), np.int32)
        labels[:, 1] = 1
        batch["image_labels"] = jnp.asarray(labels)
        variables = model.init(RNG, batch, False)
        out = model.apply(variables, batch, False)
        assert "losses" in out and len(out["losses"]) > 0, task
        for v in out["losses"].values():
            assert np.isfinite(float(v)), task


def test_lxmert_pretraining_and_classification():
    base = dict(SMALL, l_layers=2, x_layers=1, r_layers=1,
                visual_feat_dim=32, task_qa=False)
    # pretraining
    mc = omega.create(dict(base, training_head_type="pretraining"))
    model = registry.get_model_class("lxmert")(config=mc)
    batch = _vl_batch()
    lm = np.full((B, 6), -1)
    lm[:, 1] = 3
    batch["lm_label_ids"] = jnp.asarray(lm)
    batch["is_correct"] = jnp.ones(B, jnp.int32)
    labels = np.zeros((B, 4), np.int32)
    labels[:, 0] = 1
    batch["image_labels"] = jnp.asarray(labels)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert "train/vqa2/masked_lm_loss" in out["losses"]
    assert "train/vqa2/matched_loss" in out["losses"]
    assert "train/vqa2/feat_loss" in out["losses"]
    # classification
    mc2 = omega.create(dict(base, training_head_type="vqa2", num_labels=5))
    model2 = registry.get_model_class("lxmert")(config=mc2)
    v2 = model2.init(RNG, batch, False)
    out2 = model2.apply(v2, batch, False)
    assert out2["scores"].shape == (B, 5)


def test_vinvl():
    mc = omega.create(dict(SMALL, training_head_type="classification",
                           num_labels=4))
    model = registry.get_model_class("vinvl")(config=mc)
    batch = _vl_batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (B, 4)


def test_alignment_model():
    mc = omega.create({
        "final_hidden_size": 16,
        "num_attention_heads": 4,
        "text_encoder": {"type": "transformer",
                         "params": {"hidden_size": 16, "num_hidden_layers": 1,
                                    "num_attention_heads": 2,
                                    "vocab_size": 50}},
        "dtype": "float32",
    })
    model = registry.get_model_class("cm_shared_transformer")(config=mc)
    batch = _vl_batch(fdim=16)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (B, 16)
    assert out["targets"].shape == (B, 16)
    # reference defaults: text embeddings normalized, image NOT
    # (alignment.py:207-209,241-242 norm_text/img_embeddings flags)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["targets"]), axis=-1), 1.0, rtol=1e-4
    )
    assert not np.allclose(
        np.linalg.norm(np.asarray(out["scores"]), axis=-1), 1.0, rtol=1e-4
    )
    assert np.array_equal(np.asarray(out["text_len"]),
                          np.asarray(batch["input_mask"]).sum(-1))


def test_unit_base_args_alias():
    """Reference configs nest DETR knobs under base_args with their DETR
    names (configs/models/unit/defaults.yaml:20-50) — they must map onto
    the flat keys, including the per-task num_queries dict."""
    registry.register("config", omega.create({"datasets": "detection_coco",
                                              "training": {}}))
    mc = omega.create({
        "base_args": {
            "enc_layers": 1, "dec_layers": 1, "nheads": 4,
            "encoder_hidden_dim": 32, "dim_feedforward": 64,
            "dropout": 0.0, "backbone": "resnet18",
            "num_queries": {"detection": {"detection_coco": 6}},
            "share_decoders": True, "eos_coef": 0.2,
        },
        "num_classes": 10, "vocab_size": 50, "dtype": "float32",
        "task_map": {"detection_coco": "detection"},
    })
    model = registry.get_model_class("unit")(config=mc)
    rng = np.random.RandomState(0)
    det_batch = {
        "image": jnp.asarray(rng.randn(B, 3, 64, 64).astype(np.float32)),
        "labels": jnp.asarray([[1, 2, -1], [3, -1, -1]]),
        "boxes": jnp.asarray(rng.rand(B, 3, 4).astype(np.float32)),
        "dataset_name": "detection_coco",
        "dataset_type": "train",
    }
    variables = model.init({"params": RNG, "dropout": RNG}, det_batch, True)
    out, _ = model.apply(
        variables, det_batch, True, mutable=["batch_stats"],
        rngs={"dropout": RNG},
    )
    # 6 queries from the per-task dict; 32 hidden from encoder_hidden_dim
    assert out["scores"].shape == (B, 6, 11)
    assert out["pred_boxes"].shape == (B, 6, 4)


def test_unit_detection_and_vl():
    registry.register("config", omega.create({"datasets": "detection_coco",
                                              "training": {}}))
    mc = omega.create({
        "hidden_size": 32, "num_encoder_layers": 1, "num_decoder_layers": 1,
        "num_attention_heads": 4, "num_queries": 6, "num_classes": 10,
        "backbone_depth": 18, "vocab_size": 50, "dtype": "float32",
        "task_map": {"detection_coco": "detection", "vqa2": "vl"},
        "heads": {"vqa2": {"num_labels": 5}},
    })
    model = registry.get_model_class("unit")(config=mc)
    rng = np.random.RandomState(0)
    det_batch = {
        "image": jnp.asarray(rng.randn(B, 3, 64, 64).astype(np.float32)),
        "labels": jnp.asarray([[1, 2, -1], [3, -1, -1]]),
        "boxes": jnp.asarray(rng.rand(B, 3, 4).astype(np.float32)),
        "dataset_name": "detection_coco",
        "dataset_type": "train",
    }
    variables = model.init({"params": RNG, "dropout": RNG}, det_batch, True)
    out, _ = model.apply(
        variables, det_batch, True, mutable=["batch_stats"],
        rngs={"dropout": RNG},
    )
    assert out["scores"].shape == (B, 6, 11)
    assert out["pred_boxes"].shape == (B, 6, 4)
    assert any("detection_ce" in k for k in out["losses"])
    for v in out["losses"].values():
        assert np.isfinite(float(v))

    # vl task with separate decoder
    vl_batch = _vl_batch(fdim=32, with_bbox=False)
    variables_vl = model.init(RNG, vl_batch, False)
    out_vl = model.apply(variables_vl, vl_batch, False)
    assert out_vl["scores"].shape == (B, 5)


def test_krisp():
    vb_cfg = dict(SMALL, training_head_type="classification", num_labels=6,
                  visual_embedding_dim=32, max_position_embeddings=32)
    mc = omega.create({
        "graph_module": {"num_nodes": 20, "node_hid_dim": 8,
                         "num_gcn_layers": 1, "kb_path": None},
        "visual_bert": vb_cfg,
    })
    model = registry.get_model_class("krisp")(config=mc)
    batch = _vl_batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (B, 6)


# reference-shaped mmf_bert config (mmf/configs/models/mmf_bert/
# defaults.yaml): raw MultiheadAttention params, shared projection,
# element-multiply combine
MMF_BERT_KEYS = {
    "model_data_dir": "",
    "combine_embeddings": True,
    "image_intra_attention": True,
    "text_embeddings": [
        {"embed_dim": 32, "num_heads": 4, "dropout": 0.0}],
    "image_feature_embeddings": [
        {"embed_dim": 32, "num_heads": 4, "dropout": 0.0}],
    "image_feature_attentions": [
        {"embed_dim": 32, "num_heads": 4, "dropout": 0.0}],
    "image_feature_dim": 32,
    "image_feature_projection": {"module": "linear", "in_dim": 32,
                                 "out_dim": 32},
    "image_feature_encodings": [{"type": "default",
                                 "params": {"in_dim": 32}}],
    "image_text_modal_combine": {
        "type": "non_linear_element_multiply",
        "params": {"dropout": 0, "hidden_dim": 32}},
}


def test_mmf_bert():
    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    registry.register("vqa2_num_final_outputs", 7)
    mc = omega.create(dict(SMALL, **MMF_BERT_KEYS,
                           training_head_type="classification"))
    model = registry.get_model_class("mmf_bert")(config=mc)
    batch = _vl_batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (B, 7)
    # the image stream must actually reach the head: perturbing region
    # features has to move the logits (the combine layer carries them)
    batch2 = dict(batch)
    batch2["image_feature_0"] = batch["image_feature_0"] + 1.0
    out2 = model.apply(variables, batch2, False)
    assert not np.allclose(np.asarray(out["scores"]),
                           np.asarray(out2["scores"]))


def test_vinvl_pretraining_two_pass():
    """MLM on masked ids + three-way contrastive on a SECOND forward over
    corrupted ids (reference vinvl.py:358-390)."""
    mc = omega.create(dict(SMALL, training_head_type="pretraining"))
    model = registry.get_model_class("vinvl")(config=mc)
    batch = dict(_vl_batch())
    ids = np.asarray(batch["input_ids"])
    rng = np.random.RandomState(3)
    batch["input_ids_masked"] = ids
    lm = ids.copy()
    lm[:, ::2] = -1
    batch["lm_label_ids"] = lm
    batch["input_ids_corrupt"] = rng.randint(0, 50, ids.shape)
    batch["segment_ids_corrupt"] = np.zeros_like(ids)
    batch["input_mask_corrupt"] = np.ones_like(ids)
    batch["contrastive_labels"] = np.asarray([0, 1] * (B // 2))[:B]
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    keys = list(out["losses"])
    assert any("masked_lm_loss" in k for k in keys), keys
    assert any("three_way_contrastive_loss" in k for k in keys), keys
    # corrupting the corrupt-pass inputs must change ONLY the contrastive
    # loss (it runs on its own forward)
    batch2 = dict(batch)
    batch2["input_ids_corrupt"] = rng.randint(0, 50, ids.shape)
    out2 = model.apply(variables, batch2, False)
    mlm_key = [k for k in keys if "masked_lm" in k][0]
    c_key = [k for k in keys if "three_way" in k][0]
    assert float(out["losses"][mlm_key]) == float(out2["losses"][mlm_key])
    assert float(out["losses"][c_key]) != float(out2["losses"][c_key])


def test_krisp_modes():
    """Reference composition machinery: feed_vb_to_graph, mc4 bilinear
    pointer, output_combine, zerobias (reference krisp.py:132-244)."""
    import jax as _jax

    base = dict(
        graph_module={"num_nodes": 16, "node_hid_dim": 8,
                      "num_gcn_layers": 2},
        visual_bert=dict(SMALL, training_head_type="classification",
                         num_labels=6),
    )
    batch = _vl_batch()

    def run(**over):
        mc = omega.create(dict(base, **over))
        m = registry.get_model_class("krisp")(config=mc)
        v = m.init(RNG, batch, False)
        return np.asarray(m.apply(v, batch, False)["scores"]), m, v

    s_add, _, _ = run(output_combine="add")
    assert s_add.shape == (B, 6)

    s_cat, _, _ = run(output_combine="concat")
    assert s_cat.shape == (B, 6 + 6)  # vb logits ++ graph logits

    s_mc4, _, _ = run(graph_logit_mode="mc4", feed_vb_to_graph=True,
                      feed_mode="feed_vb_hid_to_graph")
    assert s_mc4.shape == (B, 6)

    s_logit_feed, _, _ = run(feed_vb_to_graph=True,
                             feed_mode="feed_vb_logit_to_graph")
    assert s_logit_feed.shape == (B, 6)

    s_zb, _, _ = run(output_combine="add", zerobias=True)
    np.testing.assert_allclose(s_zb, s_add - 6.58, atol=1e-5)

    # missing_ans_inds zero the graph contribution for those answers
    s_missing, _, _ = run(output_combine="add",
                          missing_ans_inds=[0, 1, 2, 3, 4, 5])
    s_vb_only = s_missing  # all graph logits zeroed -> pure vb logits
    assert np.isfinite(s_vb_only).all()


def test_mmf_bert_heads():
    """Per-head behaviors (reference mmf_bert.py:356-417): pretraining
    MLM+NSP, vqa 2nd-last-token gather, visual_entailment pooled."""
    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    registry.register("vqa2_num_final_outputs", 7)
    base = dict(SMALL, **MMF_BERT_KEYS, training_head_type="pretraining")
    batch = dict(_vl_batch())
    ids = np.asarray(batch["input_ids"])
    lm = ids.copy(); lm[:, ::2] = -1
    batch["lm_label_ids"] = lm
    batch["is_correct"] = np.asarray([1, 0] * (B // 2))[:B]

    m = registry.get_model_class("mmf_bert")(config=omega.create(base))
    v = m.init(RNG, batch, False)
    out = m.apply(v, batch, False)
    assert any("masked_lm_loss" in k for k in out["losses"])
    assert any("next_sentence_loss" in k for k in out["losses"])
    assert "seq_relationship_score" in out

    m2 = registry.get_model_class("mmf_bert")(config=omega.create(
        dict(SMALL, **MMF_BERT_KEYS, training_head_type="vqa",
             num_labels=7)))
    v2 = m2.init(RNG, batch, False)
    assert m2.apply(v2, batch, False)["scores"].shape == (B, 7)

    m3 = registry.get_model_class("mmf_bert")(config=omega.create(
        dict(SMALL, **MMF_BERT_KEYS,
             training_head_type="visual_entailment")))
    v3 = m3.init(RNG, batch, False)
    assert m3.apply(v3, batch, False)["scores"].shape == (B, 3)


def test_movie_mcan_features_and_raw_image():
    """MoVie+MCAN runs on flattened grid features, and with a configured
    grid encoder on raw images (reference movie_mcan.py:70-84)."""
    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    registry.register("vqa2_num_final_outputs", 9)
    mc = omega.create({
        "text_embeddings": {"params": {"hidden_dim": 16,
                                       "embedding_dim": 300,
                                       "num_attn": 2, "num_layers": 1,
                                       "dropout": 0.0, "num_attn_pool": 1,
                                       "num_feat": 2}},
        "image_feature_embeddings": {"params": {"hidden_dim": 16,
                                                "cond_dim": 32,
                                                "num_attn": 2,
                                                "num_layers": 1,
                                                "dropout": 0.0,
                                                "cbn_num_layers": 1}},
        "text_vocab_size": 60,
        "dtype": "float32",
    })
    m = registry.get_model_class("movie_mcan")(config=mc)
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(0, 60, (B, 7))),
        "text_mask": jnp.ones((B, 7), jnp.float32),
        # 16 tokens -> 4x4 grid of 24-dim features
        "image_feature_0": jnp.asarray(
            rng.randn(B, 16, 24).astype(np.float32)),
        "dataset_name": "vqa2", "dataset_type": "train",
    }
    v = m.init({"params": RNG, "dropout": RNG}, batch, False)
    out = m.apply(v, batch, False)
    assert out["scores"].shape == (B, 9)
    assert np.isfinite(np.asarray(out["scores"])).all()

    # raw image + configured grid encoder
    mc2 = omega.create(dict(mc, image_feature_encodings=[
        {"type": "torchvision_resnet",
         "params": {"name": "resnet18", "num_output_features": -1}}]))
    m2 = registry.get_model_class("movie_mcan")(config=mc2)
    batch2 = dict(batch)
    batch2.pop("image_feature_0")
    batch2["image"] = jnp.asarray(
        rng.randn(B, 3, 64, 64).astype(np.float32))
    v2 = m2.init({"params": RNG, "dropout": RNG}, batch2, False)
    out2 = m2.apply(v2, batch2, False)
    assert out2["scores"].shape == (B, 9)


def test_unit_padding_invariance():
    """Pad tokens must not receive attention: garbage in padded input_ids
    positions cannot change the logits (regression for the missing
    memory bias)."""
    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    mc = omega.create({
        "hidden_size": 32, "num_encoder_layers": 1, "num_decoder_layers": 1,
        "num_attention_heads": 4, "num_queries": 4, "num_classes": 5,
        "vocab_size": 50, "dropout": 0.0, "dtype": "float32",
        "task_map": {"vqa2": "vl"}, "vqa_num_labels": 7,
    })
    m = registry.get_model_class("unit")(config=mc)
    rng = np.random.RandomState(0)
    T = 8
    ids = rng.randint(1, 50, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[:, 5:] = 0  # last three positions are padding
    batch = {
        "input_ids": ids,
        "input_mask": mask,
        "segment_ids": np.zeros((B, T), np.int64),
        "image_feature_0": rng.randn(B, 6, 32).astype(np.float32),
        "dataset_name": "vqa2", "dataset_type": "val",
    }
    v = m.init(RNG, batch, False)
    s1 = np.asarray(m.apply(v, batch, False)["scores"])
    batch2 = dict(batch)
    ids2 = ids.copy()
    ids2[:, 5:] = rng.randint(1, 50, (B, 3))  # different pad content
    batch2["input_ids"] = ids2
    s2 = np.asarray(m.apply(v, batch2, False)["scores"])
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_vilbert_nlvr2_pairs_by_halves():
    """nlvr2 must pair img0/img1 of the SAME sample: swapping the two
    samples' img1 features must change BOTH rows' scores (the broken
    reshape paired adjacent rows instead)."""
    cfg = dict(training_head_type="nlvr2", vocab_size=60, hidden_size=24,
               num_hidden_layers=1, num_attention_heads=4,
               intermediate_size=48, v_hidden_size=24,
               v_num_hidden_layers=1, v_num_attention_heads=4,
               v_intermediate_size=48, bi_hidden_size=24,
               bi_num_attention_heads=4, v_biattention_id=[0],
               t_biattention_id=[0], v_feature_size=16,
               max_position_embeddings=32, num_labels=2, losses=[],
               visual_target=0, dynamic_attention=False,
               fusion_method="mul")
    m = registry.get_model_class("vilbert")(config=omega.create(cfg))
    rng = np.random.RandomState(0)
    T, R = 6, 4

    def img(seed):
        r = np.random.RandomState(seed)
        return {"image_feature_0": r.randn(B, R, 16).astype(np.float32),
                "image_info_0": {"bbox": r.rand(B, R, 4).astype(np.float32),
                                 "max_features": np.asarray([R, R])}}

    batch = {
        "input_ids": rng.randint(0, 60, (B, T)),
        "input_mask": np.ones((B, T), np.int64),
        "segment_ids": np.zeros((B, T), np.int64),
        "img0": img(1), "img1": img(2),
        "dataset_name": "nlvr2", "dataset_type": "val",
    }
    v = m.init(RNG, batch, False)
    s1 = np.asarray(m.apply(v, batch, False)["scores"])
    assert s1.shape == (B, 2)
    # swap img1 rows between the two samples
    b2 = dict(batch)
    f = batch["img1"]["image_feature_0"]
    b2["img1"] = dict(batch["img1"], image_feature_0=f[::-1].copy())
    s2 = np.asarray(m.apply(v, b2, False)["scores"])
    assert np.abs(s1[0] - s2[0]).max() > 1e-6
    assert np.abs(s1[1] - s2[1]).max() > 1e-6
