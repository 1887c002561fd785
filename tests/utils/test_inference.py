"""End-to-end Inference pipeline: zoo-style checkpoint dir -> model +
processors -> answer for a local image, in both raw-image and
on-the-fly-region-feature modes (reference utils/inference.py:15-76)."""

import numpy as np
import pytest

from mmf_tpu.config import omega
from mmf_tpu.utils.env import setup_imports

setup_imports()

VOCAB = "tests/data/vocab.txt"


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    """A zoo-layout folder: config.yaml + model.ckpt with variables for a
    tiny visual_bert classifier."""
    import jax

    from mmf_tpu.common.registry import registry
    from mmf_tpu.utils.checkpoint import _checkpointer

    root = tmp_path_factory.mktemp("inference_zoo")
    config = {
        "model": "visual_bert",
        "model_config": {
            "visual_bert": {
                "training_head_type": "classification",
                "num_labels": 4,
                "vocab_size": 2000,
                "hidden_size": 32,
                "num_hidden_layers": 1,
                "num_attention_heads": 4,
                "intermediate_size": 64,
                "visual_embedding_dim": 2048,
                "max_position_embeddings": 64,
                "dtype": "float32",
            }
        },
        "dataset_config": {
            "vqa2": {
                "processors": {
                    "text_processor": {
                        "type": "bert_tokenizer",
                        "params": {
                            "max_seq_length": 12,
                            "tokenizer_config": {
                                "type": "bert-base-uncased",
                                "vocab_file": VOCAB,
                            },
                        },
                    }
                }
            }
        },
    }
    omega_cfg = omega.create(config)
    (root / "config.yaml").write_text(omega.to_yaml(omega_cfg))

    registry.register("config", omega.create({"datasets": "vqa2",
                                              "training": {}}))
    model_cls = registry.get_model_class("visual_bert")
    model = model_cls(config=omega_cfg.model_config.visual_bert)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": np.asarray(rng.randint(0, 100, (1, 12))),
        "input_mask": np.ones((1, 12), np.int32),
        "segment_ids": np.zeros((1, 12), np.int32),
        "image_feature_0": rng.randn(1, 10, 2048).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    _checkpointer().save(str(root / "model.ckpt"), {"variables": variables})
    return str(root)


def _image(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    p = tmp_path / "img.jpg"
    Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)).save(p)
    return str(p)


def test_inference_with_region_features(ckpt_dir, tmp_path):
    from mmf_tpu.utils.inference import Inference

    inference = Inference(checkpoint_path=ckpt_dir)
    # trim the on-the-fly detector so CPU can run it
    result = inference.forward(
        _image(tmp_path), {"text": "what color is the square"},
        image_format="features",
    )
    assert set(result) == {"label", "confidence"}
    assert 0 <= result["label"] < 4
    assert 0.0 <= result["confidence"] <= 1.0


def test_inference_reuses_detector(ckpt_dir, tmp_path):
    from mmf_tpu.utils.inference import Inference

    inference = Inference(checkpoint_path=ckpt_dir)
    inference.forward(_image(tmp_path), {"text": "q one"},
                      image_format="features")
    frcnn_first = inference._frcnn
    inference.forward(_image(tmp_path), {"text": "q two"},
                      image_format="features")
    assert inference._frcnn is frcnn_first  # built once, reused
