import jax
import jax.numpy as jnp
import numpy as np

from mmf_tpu.common.registry import registry
from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)


def _small_config(heads=None):
    cfg = load_yaml("configs/models/mmf_transformer/defaults.yaml")
    mc = cfg["model_config"]["mmf_transformer"]
    mc.update(
        {"hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
         "vocab_size": 100, "dtype": "float32"}
    )
    mc["modalities"] = [
        {"type": "text", "key": "text", "position_dim": 64,
         "embedding_dim": 32, "segment_id": 0},
        {"type": "image", "key": "image", "embedding_dim": 16,
         "position_dim": 8, "segment_id": 1},
    ]
    mc["heads"] = heads or [
        {"type": "mlp", "in_dim": 32, "hidden_size": 32, "num_labels": 3}
    ]
    return mc


def _batch(B=2, T=6, R=4):
    rng = np.random.RandomState(0)
    return {
        "text": jnp.asarray(rng.randint(0, 100, (B, T))),
        "input_mask": jnp.ones((B, T), jnp.int32),
        "image_feature_0": jnp.asarray(rng.randn(B, R, 16).astype(np.float32)),
        "dataset_name": "vqa2",
        "dataset_type": "train",
    }


def test_mmft_classification():
    cls = registry.get_model_class("mmf_transformer")
    model = cls(config=_small_config())
    batch = _batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 3)


def test_mmft_alias_registered():
    assert registry.get_model_class("mmft") is registry.get_model_class(
        "mmf_transformer"
    )


def test_mmft_pretraining_heads():
    heads = [
        {"type": "mlm", "hidden_size": 32, "vocab_size": 100},
        {"type": "itm", "hidden_size": 32},
    ]
    cls = registry.get_model_class("mmf_transformer")
    model = cls(config=_small_config(heads))
    batch = _batch()
    lm = np.full((2, 6), -1)
    lm[:, 1] = 3
    batch["lm_label_ids"] = jnp.asarray(lm)
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert "train/vqa2/masked_lm_loss" in out["losses"]
    assert "train/vqa2/itm_loss" in out["losses"]


def test_mlm_head_ties_to_text_embeddings():
    """MLM head decoder must tie to the text token table (reference
    mmf_transformer.py:145-174): no separate decoder kernel exists, and
    perturbing the embedding changes the MLM logits identically."""
    import jax
    import numpy as np

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega

    mc = omega.create({
        "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 4,
        "intermediate_size": 64, "vocab_size": 60, "dtype": "float32",
        "heads": [{"type": "mlm", "vocab_size": 60, "hidden_size": 32}],
        "modalities": [
            {"key": "text", "type": "text", "segment_id": 0},
            {"key": "image", "type": "image", "segment_id": 1,
             "embedding_dim": 16},
        ],
    })
    model = registry.get_model_class("mmf_transformer")(config=mc)
    rng = np.random.RandomState(0)
    B, S, R = 2, 5, 3
    lm = rng.randint(0, 60, (B, S))
    batch = {
        "input_ids": rng.randint(0, 60, (B, S)),
        "input_mask": np.ones((B, S), np.int64),
        "segment_ids": np.zeros((B, S), np.int64),
        "image": rng.randn(B, R, 16).astype(np.float32),
        "lm_label_ids": lm,
        "dataset_name": "masked_coco", "dataset_type": "train",
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    paths = ["/".join(str(p) for p in path) for path, _ in flat]
    assert not any("decoder" in p for p in paths), (
        "tied MLM head must not own a decoder kernel", paths)
    out = model.apply(variables, batch, False)
    assert any("masked_lm_loss" in k for k in out["losses"])
