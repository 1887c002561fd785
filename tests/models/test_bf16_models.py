"""bf16 compute-dtype smoke tests for model families whose stacks honor a
``dtype`` config key (params stay f32; activations/gemms run bf16 — the
policy BENCH_NOTES.md's headline eval numbers use).

For each family we init params once (f32), then run the same params through
an f32-configured and a bf16-configured model. The outputs must be close
(bf16 round-off only) but NOT bit-identical — inequality proves the dtype
knob actually reaches the gemms instead of being silently ignored, which is
exactly the regression these models had before round 3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config import omega
from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)
B = 2

SMALL = {"hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
         "intermediate_size": 64, "vocab_size": 50}


def _vl_batch(T=6, R=4, fdim=32):
    rng = np.random.RandomState(0)
    return {
        "input_ids": jnp.asarray(rng.randint(0, 50, (B, T))),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "segment_ids": jnp.zeros((B, T), jnp.int32),
        "image_feature_0": jnp.asarray(
            rng.randn(B, R, fdim).astype(np.float32)
        ),
        "image_info_0": {
            "bbox": jnp.asarray(rng.rand(B, R, 4).astype(np.float32)),
            "max_features": jnp.asarray([R, R]),
        },
        "dataset_name": "vqa2",
        "dataset_type": "train",
    }


def _assert_bf16_engaged(scores32, scores16, atol=0.15):
    a, b = np.asarray(scores32, np.float32), np.asarray(scores16, np.float32)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=atol)
    assert not np.array_equal(a, b), (
        "bf16 output is bit-identical to f32 — the dtype knob is ignored"
    )


def _run_pair(name, mk_config, batch):
    cls = registry.get_model_class(name)
    m32 = cls(config=mk_config("float32"))
    m16 = cls(config=mk_config("bfloat16"))
    variables = m32.init(RNG, batch, False)
    out32 = m32.apply(variables, batch, False)
    out16 = m16.apply(variables, batch, False)
    _assert_bf16_engaged(out32["scores"], out16["scores"])


def test_uniter_bf16():
    def mk(dtype):
        return omega.create(dict(
            SMALL, img_dim=32, do_pretraining=False, tasks="vqa2",
            dtype=dtype,
            heads={"vqa2": {"type": "mlp", "num_labels": 5,
                            "hidden_size": 32}},
        ))
    _run_pair("uniter", mk, _vl_batch())


def test_lxmert_bf16():
    def mk(dtype):
        return omega.create(dict(
            SMALL, l_layers=2, x_layers=1, r_layers=1, visual_feat_dim=32,
            task_qa=False, training_head_type="vqa2", num_labels=5,
            dtype=dtype,
        ))
    _run_pair("lxmert", mk, _vl_batch())


def test_vilbert_bf16():
    def mk(dtype):
        cfg = load_yaml("configs/models/vilbert/defaults.yaml")
        mc = cfg["model_config"]["vilbert"]
        mc.update({
            "training_head_type": "classification",
            "vocab_size": 50, "hidden_size": 32, "num_hidden_layers": 4,
            "num_attention_heads": 4, "intermediate_size": 64,
            "v_feature_size": 32, "v_hidden_size": 24,
            "v_num_hidden_layers": 2, "v_num_attention_heads": 4,
            "v_intermediate_size": 48, "bi_hidden_size": 24,
            "bi_num_attention_heads": 4, "v_target_size": 11,
            "v_biattention_id": [0, 1], "t_biattention_id": [2, 3],
            "num_labels": 3, "dtype": dtype,
        })
        return mc

    batch = _vl_batch()
    batch["image_info_0"]["bbox"] = jnp.asarray(
        np.random.RandomState(0).rand(B, 4, 5).astype(np.float32)
    )
    batch["image_info_0"]["cls_prob"] = jnp.asarray(
        np.abs(np.random.RandomState(1).rand(B, 4, 11)).astype(np.float32)
    )
    _run_pair("vilbert", mk, batch)


def test_m4c_bf16():
    registry.register("textvqa_num_final_outputs", 20)

    def mk(dtype):
        cfg = load_yaml("configs/models/m4c/defaults.yaml")
        mc = cfg["model_config"]["m4c"]
        mc["text_bert"].update(
            {"num_hidden_layers": 1, "vocab_size": 100, "hidden_size": 16,
             "num_attention_heads": 2}
        )
        mc["mmt"].update(
            {"hidden_size": 16, "num_hidden_layers": 1,
             "num_attention_heads": 2}
        )
        mc["obj"]["mmt_in_dim"] = 2048
        mc["classifier"]["ocr_max_num"] = 4
        mc["classifier"]["ocr_ptr_net"] = {"hidden_size": 16,
                                           "query_key_size": 8}
        mc["datasets"] = "textvqa"
        mc["dtype"] = dtype
        return mc

    T, OBJ, OCR, DEC = 6, 5, 4, 4
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(0, 100, (B, T))),
        "text_len": jnp.asarray([T, T - 2]),
        "image_feature_0": jnp.asarray(
            rng.randn(B, OBJ, 2048).astype(np.float32)
        ),
        "image_info_0": {"max_features": jnp.asarray([OBJ, OBJ - 1])},
        "obj_bbox_coordinates": jnp.asarray(
            rng.rand(B, OBJ, 4).astype(np.float32)
        ),
        "context_feature_0": jnp.asarray(
            rng.randn(B, OCR, 300).astype(np.float32)
        ),
        "context_feature_1": jnp.asarray(
            rng.randn(B, OCR, 604).astype(np.float32)
        ),
        "image_feature_1": jnp.asarray(
            rng.randn(B, OCR, 2048).astype(np.float32)
        ),
        "order_vectors": jnp.zeros((B, OCR, 50), np.float32),
        "ocr_bbox_coordinates": jnp.asarray(
            rng.rand(B, OCR, 4).astype(np.float32)
        ),
        "context_info_0": {"max_features": jnp.asarray([OCR, OCR - 1])},
        "train_prev_inds": jnp.zeros((B, DEC), jnp.int32),
        "dataset_name": "textvqa",
        "dataset_type": "train",
    }
    _run_pair("m4c", mk, batch)


def test_mmf_bert_bf16():
    from tests.models.test_model_zoo2 import MMF_BERT_KEYS

    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    registry.register("vqa2_num_final_outputs", 7)

    def mk(dtype):
        return omega.create(dict(
            SMALL, **MMF_BERT_KEYS,
            training_head_type="classification", dtype=dtype,
        ))

    batch = _vl_batch()
    batch.pop("image_info_0", None)
    _run_pair("mmf_bert", mk, batch)


def test_movie_mcan_bf16():
    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    registry.register("vqa2_num_final_outputs", 9)

    def mk(dtype):
        return omega.create({
            "text_embeddings": {"params": {
                "hidden_dim": 16, "embedding_dim": 300, "num_attn": 2,
                "num_layers": 1, "dropout": 0.0, "num_attn_pool": 1,
                "num_feat": 2}},
            "image_feature_embeddings": {"params": {
                "hidden_dim": 16, "cond_dim": 32, "num_attn": 2,
                "num_layers": 1, "dropout": 0.0, "cbn_num_layers": 1}},
            "text_vocab_size": 60,
            "dtype": dtype,
        })

    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(rng.randint(0, 60, (B, 7))),
        "text_mask": jnp.ones((B, 7), jnp.float32),
        "image_feature_0": jnp.asarray(
            rng.randn(B, 16, 24).astype(np.float32)),
        "dataset_name": "vqa2", "dataset_type": "train",
    }
    _run_pair("movie_mcan", mk, batch)


def test_unit_bf16():
    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))

    def mk(dtype):
        return omega.create({
            "hidden_size": 32, "num_encoder_layers": 1,
            "num_decoder_layers": 1, "num_attention_heads": 4,
            "num_queries": 6, "num_classes": 10, "backbone_depth": 18,
            "vocab_size": 50, "dtype": dtype,
            "task_map": {"vqa2": "vl"},
            "heads": {"vqa2": {"num_labels": 5}},
        })

    batch = _vl_batch()
    batch.pop("image_info_0", None)
    _run_pair("unit", mk, batch)
