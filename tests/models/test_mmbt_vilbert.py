import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)


def _small_mmbt(head="classification", direct=False):
    cfg = load_yaml("configs/models/mmbt/defaults.yaml")
    mc = cfg["model_config"]["mmbt"]
    mc["training_head_type"] = head
    mc["direct_features_input"] = direct
    mc["modal_hidden_size"] = 16 if direct else 2048
    mc["dtype"] = "float32"
    mc["num_labels"] = 3
    mc["text_encoder"]["params"].update(
        {"hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
         "intermediate_size": 64, "vocab_size": 100}
    )
    return mc


def _mmbt_batch(B=2, T=10, direct=False):
    rng = np.random.RandomState(0)
    input_ids = rng.randint(5, 100, (B, T))
    batch = {
        "input_ids": jnp.asarray(input_ids),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "segment_ids": jnp.zeros((B, T), jnp.int32),
        "dataset_name": "hateful_memes",
        "dataset_type": "train",
    }
    if direct:
        batch["image_feature_0"] = jnp.asarray(
            rng.randn(B, 4, 16).astype(np.float32)
        )
    else:
        batch["image"] = jnp.asarray(
            rng.randn(B, 3, 64, 64).astype(np.float32)
        )
    return batch


def test_mmbt_direct_features_classification():
    cls = registry.get_model_class("mmbt")
    mc = _small_mmbt(direct=True)
    model = cls(config=mc)
    batch = _mmbt_batch(direct=True)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_mmbt_pretraining_mlm():
    cls = registry.get_model_class("mmbt")
    mc = _small_mmbt(head="pretraining", direct=True)
    model = cls(config=mc)
    batch = _mmbt_batch(direct=True)
    lm = np.full((2, 10), -1)
    lm[:, 3] = 7
    batch["lm_label_ids"] = jnp.asarray(lm)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert "train/hateful_memes/masked_lm_loss" in out["losses"]


def test_mmbt_resnet_end_to_end():
    cls = registry.get_model_class("mmbt")
    mc = _small_mmbt(direct=False)
    mc["modal_encoder"] = {"type": "resnet152",
                           "params": {"num_output_features": 1}}
    mc["modal_hidden_size"] = 2048
    model = cls(config=mc)
    batch = _mmbt_batch(direct=False)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 3)


def _small_vilbert(head="classification"):
    cfg = load_yaml("configs/models/vilbert/defaults.yaml")
    mc = cfg["model_config"]["vilbert"]
    mc.update(
        {
            "training_head_type": head,
            "vocab_size": 100,
            "hidden_size": 32,
            "num_hidden_layers": 4,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "v_feature_size": 16,
            "v_hidden_size": 24,
            "v_num_hidden_layers": 2,
            "v_num_attention_heads": 4,
            "v_intermediate_size": 48,
            "bi_hidden_size": 24,
            "bi_num_attention_heads": 4,
            "v_target_size": 11,
            "v_biattention_id": [0, 1],
            "t_biattention_id": [2, 3],
            "num_labels": 3,
            "dtype": "float32",
        }
    )
    return mc


def _vilbert_batch(B=2, T=8, R=5, head="classification"):
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 100, (B, T))),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "segment_ids": jnp.zeros((B, T), jnp.int32),
        "image_feature_0": jnp.asarray(rng.randn(B, R, 16).astype(np.float32)),
        "image_info_0": {
            "max_features": jnp.asarray([R, R - 1]),
            "bbox": jnp.asarray(rng.rand(B, R, 5).astype(np.float32)),
            "cls_prob": jnp.asarray(
                np.abs(rng.rand(B, R, 11)).astype(np.float32)
            ),
        },
        "dataset_name": "vqa2",
        "dataset_type": "train",
    }
    if head == "pretraining":
        lm = np.full((B, T), -1)
        lm[:, 2] = 5
        batch["lm_label_ids"] = jnp.asarray(lm)
        labels = np.zeros((B, R), np.int32)
        labels[:, 1] = 1
        batch["image_labels"] = jnp.asarray(labels)
    return batch


def test_vilbert_classification():
    cls = registry.get_model_class("vilbert")
    model = cls(config=_small_vilbert())
    batch = _vilbert_batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_vilbert_pretraining_losses():
    cls = registry.get_model_class("vilbert")
    model = cls(config=_small_vilbert("pretraining"))
    batch = _vilbert_batch(head="pretraining")
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert "train/vqa2/masked_lm_loss" in out["losses"]
    assert "train/vqa2/masked_img_loss" in out["losses"]
    for v in out["losses"].values():
        assert np.isfinite(float(v))


def test_vilbert_visual_target_modes():
    """visual_target 1 (feature MSE) and 2 (NCE vs sampled negative
    regions) — reference vilbert.py:1072-1077, 1139-1229. The target
    width must equal v_target_size for these modes (features, not class
    probs)."""
    cls = registry.get_model_class("vilbert")
    base = _small_vilbert("pretraining")
    rng = np.random.RandomState(5)
    for vt in (1, 2):
        mc = dict(base, visual_target=vt, num_negative=10)
        model = cls(config=mc)
        batch = dict(_vilbert_batch(head="pretraining"))
        # features as the regression/NCE target, width = v_target_size
        vts = mc.get("v_target_size", 1601) if vt != 1 else None
        feats = np.asarray(batch["image_feature_0"])
        tgt_dim = mc.get("v_target_size", 1601)
        info = dict(batch["image_info_0"])
        info["cls_prob"] = rng.rand(
            feats.shape[0], feats.shape[1], tgt_dim
        ).astype(np.float32)
        batch["image_info_0"] = info
        variables = model.init(RNG, batch, False)
        out = model.apply(variables, batch, False)
        key = "train/vqa2/masked_img_loss"
        assert key in out["losses"], (vt, list(out["losses"]))
        assert np.isfinite(float(out["losses"][key])), vt
        if vt == 1:
            # MSE must be zero when predictions equal targets — probe the
            # formula by feeding the target as the prediction is not
            # possible from outside, so check scale monotonicity instead:
            # doubling the target distance ups the loss
            info2 = dict(info)
            info2["cls_prob"] = info["cls_prob"] + 10.0
            b2 = dict(batch, image_info_0=info2)
            out2 = model.apply(variables, b2, False)
            assert float(out2["losses"][key]) > float(out["losses"][key])


def test_vilbert_coattention_changes_both_streams():
    """With co-attention, image content must influence text-pooled output."""
    cls = registry.get_model_class("vilbert")
    model = cls(config=_small_vilbert())
    batch = _vilbert_batch()
    variables = model.init(RNG, batch, False)
    out1 = model.apply(variables, batch, False)
    batch2 = dict(batch)
    batch2["image_feature_0"] = batch["image_feature_0"] * 3.0 + 1.0
    out2 = model.apply(variables, batch2, False)
    assert not np.allclose(
        np.asarray(out1["scores"]), np.asarray(out2["scores"])
    )
