import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmf_tpu.common.registry import registry
from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.utils.env import setup_imports

setup_imports()

RNG = jax.random.PRNGKey(0)


def _small_m4c():
    cfg = load_yaml("configs/models/m4c/defaults.yaml")
    mc = cfg["model_config"]["m4c"]
    mc["text_bert"].update(
        {"num_hidden_layers": 1, "vocab_size": 100, "hidden_size": 16,
         "num_attention_heads": 2}
    )
    mc["mmt"].update(
        {"hidden_size": 16, "num_hidden_layers": 1, "num_attention_heads": 2}
    )
    mc["obj"]["mmt_in_dim"] = 2048
    mc["classifier"]["ocr_max_num"] = 4
    mc["classifier"]["ocr_ptr_net"] = {"hidden_size": 16, "query_key_size": 8}
    mc["datasets"] = "textvqa"
    return mc


def _batch(B=2, T=6, OBJ=5, OCR=4, DEC=4):
    rng = np.random.RandomState(0)
    return {
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


def test_m4c_train_forward():
    registry.register("textvqa_num_final_outputs", 20)
    cls = registry.get_model_class("m4c")
    model = cls(config=_small_m4c())
    batch = _batch()
    variables = model.init({"params": RNG, "dropout": RNG}, batch, True)
    out = model.apply(variables, batch, True, rngs={"dropout": RNG})
    # scores: [B, DEC, (20-4 fixed) + 4 ocr] = [2, 4, 20]
    assert out["scores"].shape == (2, 4, 20)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_m4c_eval_greedy_decode():
    registry.register("textvqa_num_final_outputs", 20)
    cls = registry.get_model_class("m4c")
    model = cls(config=_small_m4c())
    batch = _batch()
    variables = model.init(RNG, batch, False)
    out = model.apply(variables, batch, False)
    assert out["scores"].shape == (2, 4, 20)
    # greedy decode is deterministic
    out2 = model.apply(variables, batch, False)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(out2["scores"])
    )


def test_m4c_eval_jits():
    registry.register("textvqa_num_final_outputs", 20)
    cls = registry.get_model_class("m4c")
    model = cls(config=_small_m4c())
    batch = _batch()
    variables = model.init(RNG, batch, False)
    arrays = {k: v for k, v in batch.items()
              if k not in ("dataset_name", "dataset_type")}
    f = jax.jit(lambda v, b: model.apply(v, b, False))
    out = f(variables, arrays)
    assert out["scores"].shape == (2, 4, 20)


def test_m4c_loss_integration():
    from mmf_tpu.modules.losses import MMFLoss

    registry.register("textvqa_num_final_outputs", 20)
    cls = registry.get_model_class("m4c")
    model = cls(config=_small_m4c())
    batch = _batch()
    variables = model.init({"params": RNG, "dropout": RNG}, batch, True)
    out = model.apply(variables, batch, True, rngs={"dropout": RNG})
    batch["targets"] = jnp.zeros((2, 4, 20), jnp.float32)
    batch["train_loss_mask"] = jnp.ones((2, 4), jnp.float32)
    loss = MMFLoss("m4c_decoding_bce_with_mask")(batch, out)
    v = float(list(loss.values())[0])
    assert np.isfinite(v) and v > 0


def test_m4c_eval_init_then_train_apply():
    """Params materialized under the scan-based eval decode must be the
    SAME tree the train path uses (nn.scan variable_broadcast keeps
    param paths unchanged), in both init directions."""
    registry.register("textvqa_num_final_outputs", 20)
    cls = registry.get_model_class("m4c")
    model = cls(config=_small_m4c())
    batch = _batch()

    eval_vars = model.init(RNG, batch, False)  # decode runs under nn.scan
    out = model.apply(eval_vars, batch, True, rngs={"dropout": RNG})
    assert out["scores"].shape == (2, 4, 20)

    train_vars = model.init({"params": RNG, "dropout": RNG}, batch, True)
    assert jax.tree_util.tree_structure(eval_vars) == (
        jax.tree_util.tree_structure(train_vars)
    )
