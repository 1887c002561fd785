import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)


def _small_vilt(heads=None):
    cfg = load_yaml("configs/models/vilt/defaults.yaml")
    mc = cfg["model_config"]["vilt"]
    mc.update(
        {"hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
         "vocab_size": 100}
    )
    mc["image_encoder"]["params"].update(
        {"patch_size": 8, "image_size": [32, 32], "mlp_dim": 64}
    )
    mc["heads"] = heads or {
        "hateful_memes": [
            {"type": "mlp", "in_dim": 32, "hidden_size": 32, "num_labels": 2}
        ]
    }
    return mc


def _batch(B=2, T=6):
    rng = np.random.RandomState(0)
    return {
        "input_ids": jnp.asarray(rng.randint(0, 100, (B, T))),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "segment_ids": jnp.zeros((B, T), jnp.int32),
        "image": jnp.asarray(rng.randn(B, 3, 32, 32).astype(np.float32)),
        "dataset_name": "hateful_memes",
        "dataset_type": "train",
    }


def test_vilt_mlp_head():
    cls = registry.get_model_class("vilt")
    model = cls(config=_small_vilt())
    batch = _batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 2)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_vilt_pretraining_heads():
    heads = {
        "hateful_memes": [
            {"type": "itm", "hidden_size": 32},
            {"type": "mlm", "hidden_size": 32, "vocab_size": 100},
        ]
    }
    cls = registry.get_model_class("vilt")
    model = cls(config=_small_vilt(heads))
    batch = _batch()
    lm = np.full((2, 6), -1)
    lm[:, 2] = 7
    batch["lm_label_ids"] = jnp.asarray(lm)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert "train/hateful_memes/itm_loss" in out["losses"]
    assert "train/hateful_memes/masked_lm_loss" in out["losses"]
    for v in out["losses"].values():
        assert np.isfinite(float(v))


def test_vilt_heads_per_dataset_dispatch():
    heads = {
        "ds_a": [{"type": "mlp", "in_dim": 32, "hidden_size": 32,
                  "num_labels": 4}],
        "ds_b": [{"type": "itm", "hidden_size": 32}],
    }
    cls = registry.get_model_class("vilt")
    model = cls(config=_small_vilt(heads))
    batch = _batch()
    batch["dataset_name"] = "ds_a"
    variables = model.init(RNG, batch, False)
    out_a = model.apply(variables, batch, False)
    assert out_a["scores"].shape == (2, 4)
