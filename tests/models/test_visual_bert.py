import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.config import omega
from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.common.registry import registry
from mmf_tpu.utils.env import setup_imports

setup_imports()


def _small_config(head="classification", **over):
    cfg = load_yaml("configs/models/visual_bert/defaults.yaml")
    mc = cfg["model_config"]["visual_bert"]
    mc.update(
        {
            "training_head_type": head,
            "vocab_size": 100,
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "visual_embedding_dim": 16,
            "max_position_embeddings": 64,
            "dtype": "float32",
            "num_labels": 3,
        }
    )
    mc.update(over)
    return mc


def _batch(B=2, T=8, R=5, vdim=16, head="classification"):
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 100, (B, T))),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "segment_ids": jnp.zeros((B, T), jnp.int32),
        "image_feature_0": jnp.asarray(
            rng.randn(B, R, vdim).astype(np.float32)
        ),
        "image_info_0": {"max_features": jnp.asarray([R, R - 2])},
        "dataset_name": "vqa2",
        "dataset_type": "train",
    }
    if head == "pretraining":
        lm = rng.randint(0, 100, (B, T))
        lm[:, ::2] = -1
        batch["lm_label_ids"] = jnp.asarray(lm)
    return batch


def test_classification_forward():
    cls = registry.get_model_class("visual_bert")
    model = cls(config=_small_config())
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 3)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_pretraining_forward_has_mlm_loss():
    cls = registry.get_model_class("visual_bert")
    model = cls(config=_small_config("pretraining"))
    batch = _batch(head="pretraining")
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    key = "train/vqa2/masked_lm_loss"
    assert key in out["losses"]
    assert float(out["losses"][key]) > 0


def test_vqa_pooler_strategy():
    cls = registry.get_model_class("visual_bert")
    model = cls(config=_small_config(pooler_strategy="vqa"))
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 3)


def test_nlvr2_pair_concat():
    cls = registry.get_model_class("visual_bert")
    model = cls(config=_small_config("nlvr2"))
    B, T, R, vdim = 2, 8, 5, 16
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 100, (B, T))),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "segment_ids": jnp.zeros((B, T), jnp.int32),
        "img0": {
            "image_feature_0": jnp.asarray(rng.randn(B, R, vdim).astype(np.float32)),
            "image_info_0": {"max_features": jnp.asarray([R, R])},
        },
        "img1": {
            "image_feature_0": jnp.asarray(rng.randn(B, R, vdim).astype(np.float32)),
            "image_info_0": {"max_features": jnp.asarray([R, R])},
        },
        "dataset_name": "nlvr2",
        "dataset_type": "train",
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 3)


def test_image_mask_respects_max_features():
    """Padded regions beyond max_features must not affect outputs."""
    cls = registry.get_model_class("visual_bert")
    model = cls(config=_small_config())
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out1 = model.apply(variables, batch, False)
    # corrupt padded region of sample 1 (max_features=3, regions 3,4 padded)
    feats = np.asarray(batch["image_feature_0"]).copy()
    feats[1, 3:] = 999.0
    batch2 = dict(batch)
    batch2["image_feature_0"] = jnp.asarray(feats)
    out2 = model.apply(variables, batch2, False)
    np.testing.assert_allclose(
        np.asarray(out1["scores"]), np.asarray(out2["scores"]), atol=1e-5
    )


def test_jit_forward():
    cls = registry.get_model_class("visual_bert")
    model = cls(config=_small_config())
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    meta = {"dataset_name": "vqa2", "dataset_type": "train"}
    arrays = {k: v for k, v in batch.items() if k not in meta}

    # strings are static: closed over, not traced (the trainer's pattern)
    f = jax.jit(lambda v, b: model.apply(v, dict(b, **meta), False))
    out = f(variables, arrays)
    assert out["scores"].shape == (2, 3)
